package graft.graph

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Versioned parquet snapshot store — the Spark-native replacement for the
 * reference's transaction machinery (community/kernel tx + WAL): every
 * commit writes a new immutable version directory and atomically flips a
 * `_latest` pointer, so readers pinned to a version get snapshot isolation
 * and writers never mutate files in place (the same contract Delta's
 * transaction log provides; implemented here dependency-free).
 *
 * Layout: dir/v<N>/nodes, dir/v<N>/rels, dir/_latest (contains N).
 *
 * At cluster scale the pointer flip would live in a metastore/Delta log;
 * the version-directory layout is unchanged.
 */
final class GraphStore(spark: SparkSession, dir: String) {

  private val latestFile = Paths.get(dir, "_latest")

  def currentVersion: Long =
    if (Files.exists(latestFile)) Files.readString(latestFile).trim.toLong else -1L

  def load(version: Long = currentVersion): PropertyGraph = {
    require(version >= 0, s"no committed version in $dir")
    PropertyGraph(
      spark.read.parquet(s"$dir/v$version/nodes"),
      spark.read.parquet(s"$dir/v$version/rels"),
      readSchema(version))
  }

  /** Schema catalog per version (the reference persists index/constraint
    * descriptors in the schema store — SchemaStore.java): one
    * tab-separated line per object, written before the pointer flip. */
  private def schemaFile(version: Long) = Paths.get(s"$dir/v$version/schema.tsv")

  private def readSchema(version: Long): GraphSchema = {
    if (!Files.exists(schemaFile(version))) GraphSchema.empty
    else {
      import scala.jdk.CollectionConverters._
      val lines = Files.readAllLines(schemaFile(version)).asScala.filter(_.nonEmpty)
      GraphSchema(
        lines.collect { case l if l.startsWith("index\t") =>
          l.split("\t", -1) match {
            case Array(_, n, lb, p, k) => IndexDef(n, lb, p, k)
            case Array(_, n, lb, p, k, opts) =>
              IndexDef(n, lb, p, k,
                opts.split(";").filter(_.contains("=")).map { kv =>
                  val Array(ok, ov) = kv.split("=", 2); ok -> ov
                }.toMap)
          }
        }.toSeq,
        lines.collect { case l if l.startsWith("constraint\t") =>
          val Array(_, n, lb, p, k) = l.split("\t", -1)
          ConstraintDef(n, lb, p, k)
        }.toSeq)
    }
  }

  private def writeSchema(version: Long, s: GraphSchema): Unit = {
    // The catalog is line/tab-delimited; a tab or newline inside a name,
    // label, or property would corrupt the line and break readSchema's
    // field split on the next load — reject it up front with a clear error.
    for (f <- s.indexes.flatMap(i => Seq(i.name, i.label, i.prop, i.kind) ++
             i.options.flatMap(kv => Seq(kv._1, kv._2))) ++
           s.constraints.flatMap(c => Seq(c.name, c.label, c.prop, c.kind)))
      require(!f.exists(ch => ch == '\t' || ch == '\n' || ch == '\r'),
        s"schema object field contains a tab/newline (not storable): ${f.take(40)}")
    val body =
      (s.indexes.map { i =>
        val opts = i.options.toSeq.sorted
          .map { case (k, v) => s"$k=$v" }.mkString(";")
        s"index\t${i.name}\t${i.label}\t${i.prop}\t${i.kind}\t$opts"
      } ++
        s.constraints.map(c => s"constraint\t${c.name}\t${c.label}\t${c.prop}\t${c.kind}"))
        .mkString("\n")
    Files.createDirectories(schemaFile(version).getParent)
    Files.writeString(schemaFile(version), body)
  }

  /** Write the graph as the next version; returns the new version number.
    * Write-then-flip: a crash mid-write leaves _latest untouched.
    * Constraints are re-validated first — a violating snapshot never
    * commits (transaction-time enforcement, batch style) — and index
    * layout (range partition + sort on the indexed property) is applied so
    * parquet min/max stats prune files on indexed predicates. */
  def commit(g0: PropertyGraph): Long = {
    Schema.validate(g0)
    val g = Schema.applyLayout(g0)
    val next = currentVersion + 1
    g.nodes.write.mode("overwrite").parquet(s"$dir/v$next/nodes")
    g.rels.write.mode("overwrite").parquet(s"$dir/v$next/rels")
    writeSchema(next, g.schema)
    val tmp = Paths.get(dir, s"_latest.tmp$next")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(tmp, next.toString)
    Files.move(tmp, latestFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /**
   * Version diff — the changelog a downstream consumer (CDC feed,
   * incremental index maintenance, cache invalidation) reads between two
   * committed snapshots: per node/rel id, whether it was added, removed,
   * or changed (any non-id column differs — detected by a row hash over
   * the columns sorted by name, so column order and schema extension
   * don't produce false positives on shared columns). Three anti/inner
   * joins per table, all hash-partitioned on id; no full-row shuffles —
   * rows reduce to (id, hash) before comparing.
   *
   * @return (kind 'node'|'rel', change 'added'|'removed'|'changed', id)
   */
  def diff(vOld: Long, vNew: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val a = load(vOld); val b = load(vNew)
    def hashed(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.filter(_ != "id").map(col)
      df.select(col("id"), xxhash64(to_json(struct(cols.toIndexedSeq: _*))).as("__h"))
    }
    def tableDiff(old: org.apache.spark.sql.DataFrame,
        nw: org.apache.spark.sql.DataFrame, kind: String) = {
      val oh = hashed(old).localCheckpoint(false)
      val nh = hashed(nw).localCheckpoint(false)
      val added = nh.join(oh, Seq("id"), "left_anti")
        .select(lit(kind).as("kind"), lit("added").as("change"), col("id"))
      val removed = oh.join(nh, Seq("id"), "left_anti")
        .select(lit(kind).as("kind"), lit("removed").as("change"), col("id"))
      val changed = nh.join(oh.withColumnRenamed("__h", "__ho"), Seq("id"))
        .filter(col("__h") =!= col("__ho"))
        .select(lit(kind).as("kind"), lit("changed").as("change"), col("id"))
      added.unionByName(removed).unionByName(changed)
    }
    tableDiff(a.nodes, b.nodes, "node")
      .unionByName(tableDiff(a.rels, b.rels, "rel"))
  }

  /** Monotonic id block for CREATE (the reference's id allocator,
    * distributed-friendly: reserve a range, assign within it). */
  def nextIdRange(g: PropertyGraph, n: Long): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val maxId = g.nodes.agg(max(col("id"))).first() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    (maxId + 1, maxId + n)
  }
}
