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

  test("parseBooleanQuery splits occurs, phrases and bare terms") {
    val cs = Fulltext.parseBooleanQuery("""+spark -"bad phrase" "a b" x""")
    assert(cs == Seq(
      Fulltext.BoolClause('M', "spark", phrase = false),
      Fulltext.BoolClause('N', "bad phrase", phrase = true),
      Fulltext.BoolClause('S', "a b", phrase = true),
      Fulltext.BoolClause('S', "x", phrase = false)))
  }

  test("booleanTopK applies MUST / MUST_NOT / phrase semantics") {
    // +spark: docs 1, 4; -cluster drops 1; phrase keeps only exact
    // adjacency
    val ids = Fulltext.booleanTopK(corpus, "doc_id", "text",
      "+spark -cluster rank", k = 10).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(4L), s"got $ids")
    // a non-negated phrase is REQUIRED (documented divergence): only doc
    // 3 contains "filter pushdown"; it lacks spark so it scores 0 but is
    // still returned
    val phrase = Fulltext.booleanTopK(corpus, "doc_id", "text",
      "\"filter pushdown\" spark", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(phrase == Seq((3L, 0.0)), s"got $phrase")
  }

  test("booleanTopK phrase matches the analyzed stream, not raw text") {
    val df = Seq((1L, "Fast,   MERGE ahead"), (2L, "fast stop merge"))
      .toDF("doc_id", "text")
    val ids = Fulltext.booleanTopK(df, "doc_id", "text",
      "+\"fast merge\" ahead", k = 10).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), s"got $ids")
  }

  test("booleanTopK phrase with a stopword matches under the english analyzer") {
    // the needle drops 'the' (english stopwords), so the haystack must
    // pass the same analyzer — otherwise "over the wall" could never
    // match its own source text (needle 'over wall' is not a substring
    // of the stopword-keeping stream)
    val df = Seq((1L, "they jump over the wall quickly"),
      (2L, "leap over wall now"), (3L, "jump the fence"))
      .toDF("doc_id", "text")
    val ids = Fulltext.booleanTopK(df, "doc_id", "text",
      "+\"over the wall\" quickly", k = 10, analyzer = "english")
      .collect().map(_.getLong(0)).toSeq
    // both 1 (stopword elided between) and 2 (already adjacent) analyze
    // to 'over wall' adjacency; 3 does not
    assert(ids.toSet == Set(1L, 2L), s"got $ids")
  }

  test("booleanTopK without MUST requires at least one SHOULD match") {
    val ids = Fulltext.booleanTopK(corpus, "doc_id", "text",
      "entropy -minhash rank", k = 10).collect().map(_.getLong(0)).toSeq
    // doc 5 has entropy but also minhash (dropped); doc 2 has rank
    assert(ids == Seq(2L), s"got $ids")
  }
}
