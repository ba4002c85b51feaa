package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality tests for the probabilistic dedup family: the sketches (minhash,
  * simhash) must find planted near-duplicates and agree with exact Jaccard
  * ground truth — this is the verification the DuckDB oracle can't do. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills and wind moves through tall trees near the old stone bridge"
  private val nearDup = base.replace("lazy", "sleepy") // 1-word edit
  private val unrelated = "completely different content about spark query engines columnar storage partition pruning shuffle exchange broadcast join adaptive execution"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, base), (3L, unrelated),
    (4L, "short text"), (5L, "short text")
  ).toDF("id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs).collect()
    val byRep = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byRep(0L) === 2) // ids 0 and 2
    assert(byRep(4L) === 2) // ids 4 and 5
    assert(out.length === 4) // 4 distinct texts
  }

  test("minhash finds the near-duplicate pair and skips unrelated") {
    val pairs = Dedup.minhashDedup(docs, threshold = 0.6)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (idA,idB) order varies by select
    val flat = pairs.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
    assert(flat.contains(0L -> 1L) || flat.contains(1L -> 0L), s"missing near-dup pair in $pairs")
    assert(!flat.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("minhash estimate tracks exact jaccard on identical docs") {
    val cands = Dedup.minhashCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exactPair = cands.getOrElse((0L, 2L), cands.getOrElse((2L, 0L), -1.0))
    assert(exactPair === 1.0, "identical docs must have estimate 1.0")
  }

  test("incremental store dedup matches the full recompute on cross pairs") {
    val dir = java.nio.file.Files.createTempDirectory("mhstore").toString
    val corpus = docs // ids 0..5
    val batch = Seq(
      (10L, base.replace("quick", "swift")), // near-dup of 0/2
      (11L, "entirely novel sentence about glaciers calving into arctic seas under midnight sun")
    ).toDF("id", "text")
    Dedup.saveMinhashStore(corpus, dir)
    val inc = Dedup.minhashDedupIncremental(batch, dir, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // ground truth: full recompute over corpus ∪ batch, cross pairs only
    val full = Dedup.minhashDedup(corpus.unionByName(batch), threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        if (a >= 10L && b < 10L) Some((a, b) -> j)
        else if (b >= 10L && a < 10L) Some((b, a) -> j)
        else None
      }.toMap
    assert(inc == full, s"incremental=$inc full=$full")
    assert(inc.keys.map(_._1).toSet.contains(10L) && !inc.keys.exists(_._1 == 11L))
    // append the batch; a later near-dup of doc 10 must now match it too
    Dedup.saveMinhashStore(batch, dir, append = true)
    val batch2 = Seq((20L, base.replace("quick", "swift")
      .replace("dog", "hound"))).toDF("id", "text")
    val inc2 = Dedup.minhashDedupIncremental(batch2, dir, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc2.contains((20L, 10L)), s"append not visible: $inc2")
  }

  test("nearDupClusters resolves transitive duplicates to one canonical id") {
    // chain: 0 ≈ 1 ≈ 6 (each one edit apart; 0 vs 6 two edits, still ≥ 0.6
    // Jaccard, but the point is the UNION of pairwise edges into a cluster)
    val chained = docs.union(Seq(
      (6L, nearDup.replace("rain", "snow"))).toDF("id", "text"))
    val out = Dedup.nearDupClusters(chained, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // 0, 1, 2, 6 all canonicalize to 0; exactly one keeper in the cluster
    assert(out(0L) == (0L, true) && out(1L) == (0L, false) &&
      out(2L) == (0L, false) && out(6L) == (0L, false))
    // unrelated + the short pair keep their own clusters
    assert(out(3L) == (3L, true))
    assert(out(4L)._1 == out(5L)._1) // short texts cluster together
    val keepers = out.values.count(_._2)
    assert(keepers == 3, s"expected 3 clusters, got $out")
  }

  test("simhash hamming distance is 0 for identical, small for near-dup") {
    val pairs = Dedup.simhashDedup(docs, maxHamming = 10).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getInt(2)))
    val m = pairs.flatMap(p => Seq((p._1, p._2) -> p._3, (p._2, p._1) -> p._3)).toMap
    assert(m((0L, 2L)) === 0)
    assert(m.get((0L, 1L)).exists(_ <= 10), s"near-dup hamming too large: $m")
    assert(!m.contains((0L, 3L)), "unrelated pair must not survive")
  }

  test("exactSubstrSpans finds planted cross-doc and periodic in-doc spans") {
    val shared = ('a' to 'z').mkString + "0123456789ABCDEFGHIJKLMN" // 50 chars
    val d = Seq(
      (1L, "Q" * 10 + shared + "R" * 10),  // shared at chars 11..60
      (2L, "S" * 10 + shared + "T" * 10),
      (3L, ('a' to 'z').mkString + ('A' to 'Z').mkString), // 52 uniq chars
      (4L, "ab" * 40)                      // period-2: every 40-gram repeats
    ).toDF("id", "text")
    val spans = Dedup.exactSubstrSpans(d, k = 40).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(spans(1L) === Set((11L, 60L, 50L)), s"doc1: ${spans.get(1L)}")
    assert(spans(2L) === Set((11L, 60L, 50L)), s"doc2: ${spans.get(2L)}")
    assert(!spans.contains(3L), "unique doc must produce no spans")
    assert(spans(4L) === Set((1L, 80L, 80L)), s"doc4: ${spans.get(4L)}")
  }

  test("ngramJaccardPairs computes exact word-set jaccard") {
    val d = Seq((0L, "a b c d", "x"), (1L, "a b c e", "x"), (2L, "z", "x"))
      .toDF("id", "text", "blk")
    val out = Dedup.ngramJaccardPairs(d, Seq("blk"), 0.5).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 0L && out.head.getLong(1) === 1L)
    assert(math.abs(out.head.getDouble(2) - 3.0 / 5.0) < 1e-12)
  }

  test("incrementalClusters equals the full recompute after a batch") {
    import spark.implicits._
    // day 1: clusters {1,2,3} (canonical 1) and {10, 11} (canonical 10);
    // singletons 20, 21
    val p1 = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val ids1 = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    def resolve(pairs: org.apache.spark.sql.DataFrame,
        ids: org.apache.spark.sql.DataFrame) = {
      val comp = graft.ops.Bfs.connectedComponents(pairs)
      ids.join(comp.withColumnRenamed("node", "id"), Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("canonical"))
    }
    val day1 = resolve(p1, ids1)
    // day 2: merge the two old clusters through new id 30, attach 21 to a
    // brand-new pair, and add an untouched new pair (40, 41)
    val p2 = Seq((3L, 30L), (30L, 11L), (21L, 31L), (40L, 41L))
      .toDF("src", "dst")
    val inc = Dedup.incrementalClusters(day1, p2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = resolve(p1.unionByName(p2),
        Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 30L, 31L, 40L, 41L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc(11L) == 1L, "merged cluster must take the global min id")
    assert(inc(20L) == 20L, "untouched singleton must not move")
  }
}
