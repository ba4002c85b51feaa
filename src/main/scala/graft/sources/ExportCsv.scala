package graft.sources

import graft.graph.PropertyGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * neo4j-admin import-compatible CSV export/import — the bulk-interchange
 * sink/source of the reference's import tool (header grammar:
 * community/import-util/.../input/csv/Type.java:26-32 — ID, PROPERTY,
 * LABEL, TYPE, START_ID, END_ID; `neo4j-admin database import` consumes
 * exactly these files). A graft graph exported here round-trips into a
 * stock neo4j installation, and the import side reads the same layout
 * back into a PropertyGraph.
 *
 * Headers: nodes carry `id:ID`, `:LABEL` (labels ';'-joined, the import
 * tool's array separator) and one `name:type` column per property; rels
 * carry `:START_ID`, `:END_ID`, `:TYPE`, `id:long` and property columns.
 * Property types annotate the header (long/double/boolean/string — the
 * extractor names the reference's Header parser accepts), so the import
 * side restores Spark types instead of reading everything as STRING.
 *
 * Scale shape: both directions are plain distributed CSV scans/writes —
 * no driver materialization, one file per partition; the header line is
 * Spark's own `header` option.
 */
object ExportCsv {

  private def csvType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType => "long"
    case DoubleType | FloatType             => "double"
    case BooleanType                        => "boolean"
    case StringType                         => "string"
    case DateType                           => "date"
    case TimestampNTZType                   => "localdatetime"
    case TimestampType                      => "datetime"
    case other => throw new IllegalArgumentException(
      s"CSV export supports scalar properties only, got $other")
  }

  private def sparkType(name: String): DataType = name match {
    case "long" => LongType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "date" => DateType
    case "localdatetime" => TimestampNTZType
    case "datetime" => TimestampType
    case _ => StringType
  }

  /** Write `dir/nodes` + `dir/rels` in the import tool's header format. */
  def exportGraph(g: PropertyGraph, dir: String): Unit = {
    // NullType columns carry no values (all-null planner artifacts from
    // union-schema graphs) — nothing to export
    val nodeProps = g.nodes.schema.fields
      .filterNot(f => f.name == "id" || f.name == "labels" ||
        f.dataType == NullType)
    val nodes = g.nodes.select(
      (col("id").as("id:ID") +:
        array_join(col("labels"), ";").as(":LABEL") +:
        nodeProps.map(f => col(f.name).as(
          s"${graft.graph.PropertyGraph.colProp(f.name)}:${csvType(f.dataType)}"))
          .toIndexedSeq): _*)
    nodes.write.mode("overwrite").option("header", "true").csv(s"$dir/nodes")
    val relProps = g.rels.schema.fields
      .filterNot(f => Set("id", "src", "dst", "type")(f.name) ||
        f.dataType == NullType)
    val rels = g.rels.select(
      (col("src").as(":START_ID") +: col("dst").as(":END_ID") +:
        col("type").as(":TYPE") +: col("id").as("id:long") +:
        relProps.map(f => col(f.name).as(
          s"${graft.graph.PropertyGraph.colProp(f.name)}:${csvType(f.dataType)}"))
          .toIndexedSeq): _*)
    rels.write.mode("overwrite").option("header", "true").csv(s"$dir/rels")
  }

  /** Read a [[exportGraph]] layout back into a PropertyGraph, restoring
    * property types from the header annotations. */
  def importGraph(spark: SparkSession, dir: String): PropertyGraph = {
    def read(sub: String): DataFrame =
      spark.read.option("header", "true").csv(s"$dir/$sub")
    def typed(df: DataFrame): Seq[org.apache.spark.sql.Column] =
      df.columns.toSeq.collect {
        case c if c.contains(":") && !c.startsWith(":") =>
          val Array(name, t) = c.split(":", 2)
          col(s"`$c`").cast(sparkType(t)).as(name)
        case c if !c.contains(":") => col(s"`$c`")
      }
    val n0 = read("nodes")
    val nodes = n0.select(
      (col("`id:ID`").cast(LongType).as("id") +:
        split(col("`:LABEL`"), ";").as("labels") +:
        typed(n0.drop("id:ID", ":LABEL")).toIndexedSeq): _*)
    val r0 = read("rels")
    val rels = r0.select(
      (col("`id:long`").cast(LongType).as("id") +:
        col("`:START_ID`").cast(LongType).as("src") +:
        col("`:END_ID`").cast(LongType).as("dst") +:
        col("`:TYPE`").as("type") +:
        typed(r0.drop("id:long", ":START_ID", ":END_ID", ":TYPE"))
          .toIndexedSeq): _*)
    PropertyGraph(nodes, rels)
  }
}
