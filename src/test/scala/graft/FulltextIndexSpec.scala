package graft

import graft.functions.Fulltext
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted fulltext index ≡ in-flight BM25, and the query side reads
  * only the query terms' hash-bucket partitions. */
class FulltextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark joins shuffle data across the cluster"),
    (2L, "window functions rank rows within partitions"),
    (3L, "filter pushdown reaches the parquet scan"),
    (4L, "spark filter join window all in one document"),
    (5L, "an unrelated note about entropy and minhash"))
    .toDF("doc_id", "text")

  test("queryTextIndex returns exactly bm25TopK's scores and ranks") {
    val path = java.nio.file.Files.createTempDirectory("graft_ftidx").toString
    Fulltext.saveTextIndex(corpus, "doc_id", "text", path, buckets = 8)
    val direct = Fulltext.bm25TopK(corpus, "doc_id", "text",
        "spark filter join window", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = Fulltext.queryTextIndex(spark, path,
        "spark filter join window", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed == direct, s"indexed=$indexed direct=$direct")
    assert(direct.head._1 == 4L, "doc 4 matches all four terms")
  }

  test("the postings scan is partition-pruned to the query terms' buckets") {
    val path = java.nio.file.Files.createTempDirectory("graft_ftidx2").toString
    Fulltext.saveTextIndex(corpus, "doc_id", "text", path, buckets = 8)
    val plan = Fulltext.queryTextIndex(spark, path, "entropy", k = 3)
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(l =>
      l.contains("postings") && l.contains("PartitionFilters"))
    assert(scanLine.isDefined, s"no pruned postings scan in:\n$plan")
    assert(scanLine.get.contains("bucket"),
      s"PartitionFilters does not prune on bucket:\n${scanLine.get}")
  }
}
