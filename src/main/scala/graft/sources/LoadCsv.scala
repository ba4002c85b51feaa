package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * LOAD CSV — the reference's ad-hoc ingest operator (LogicalPlan.scala:2581
 * LoadCSV; LoadCSVPipe exposes `linenumber()` and `file()`). Cypher LOAD
 * CSV yields every field as a STRING and preserves source line numbers;
 * both carried here: fields parsed by from_csv (quote/escape aware), line
 * numbers from a per-file zipWithIndex.
 *
 * Scale note: line numbering requires the file's serial order, which is
 * inherently sequential per file — same as the reference. Many-file loads
 * parallelize across files; headers are read once on the driver (one line).
 */
object LoadCsv {

  /** @return fields as string columns named from the header (or _c0.. when
    *         headerless) + `linenumber` (1-based, counting the header) +
    *         `file`. */
  def load(spark: SparkSession, path: String, withHeaders: Boolean = true,
      sep: String = ","): DataFrame = {
    val rdd = spark.sparkContext.textFile(path)
    val numbered = rdd.zipWithIndex().map { case (l, i) => org.apache.spark.sql.Row(l, i + 1L) }
    val lines = spark.createDataFrame(numbered,
      StructType(Seq(StructField("line", StringType), StructField("linenumber",
        org.apache.spark.sql.types.LongType))))

    val headerNames: Seq[String] =
      if (withHeaders) {
        val first = rdd.first() // one line, driver-side — header only
        first.split(java.util.regex.Pattern.quote(sep)).toSeq
          .map(_.trim.stripPrefix("\"").stripSuffix("\""))
      } else Seq.empty

    val data = if (withHeaders) lines.filter(col("linenumber") > 1) else lines
    val schema =
      if (withHeaders) StructType(headerNames.map(StructField(_, StringType)))
      else {
        val n = rdd.first().split(java.util.regex.Pattern.quote(sep)).length
        StructType((0 until n).map(i => StructField(s"_c$i", StringType)))
      }
    val opts = Map("sep" -> sep)
    data
      .withColumn("__f", from_csv(col("line"), schema, opts))
      .select((schema.fieldNames.map(n => col(s"__f.$n").as(n)) :+
        col("linenumber") :+ lit(path).as("file")): _*)
  }
}
