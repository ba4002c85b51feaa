package graft

import graft.functions.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall gates for the PORTABLE ANN paths — the exact modes and parameter
  * shapes the oracle-checked entry queries run (q_knn_lsh nBits=8,
  * q_knn_ivf nList=32/nProbe=8, q_knn_ivf_indexed persisted,
  * q_knn_pq m=8/nBits=6). The r13 oracle switch proved replay-exactness;
  * these specs prove the portable hashing / replayable-Lloyd centroids /
  * lowest-id PQ seeds also keep retrieval QUALITY on the clustered
  * workload ANN is for.
  *
  * The corpus is clustered by construction (like SimilaritySpec's default-
  * mode recall gates): each point's true top-k is its own cluster. The
  * driver's sf* `embeddings` table is NOT usable for a recall gate — its
  * vectors are geometrically random (measured r14: mean pairwise cosine
  * ≈ 0.000, same-label mean ≈ cross-label mean), so no sublinear method
  * can reach 0.9 recall@10 there without scanning the corpus; entry-query
  * checks on that table stay oracle-exactness checks. */
class PortableAnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** 500 vectors in 30 well-separated 64-dim clusters (the embeddings
    * table's dimensionality), σ=0.15 intra-cluster noise. */
  private lazy val (corpus, queries, exact) = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val dim = 64
    val centers = Array.fill(30)(Array.fill(dim)(rng.nextGaussian()))
    val data = (0L until 500L).map { i =>
      val c = centers((i % 30).toInt)
      (i, c.map(x => (x + 0.15 * rng.nextGaussian()).toFloat))
    }
    val corp = data.toDF("id", "vec").cache()
    val qs = corp.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val ex = Similarity.bruteForceTopK(corp, qs, 10).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    (corp, qs, ex)
  }

  private def recall(approx: DataFrame): Double = {
    val a = approx.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    (exact intersect a).size.toDouble / exact.size
  }

  test("PORTABLE LSH at the q_knn_lsh shape (nBits=8) keeps recall ≥ 0.9") {
    val r = recall(
      Similarity.lshTopK(corpus, queries, 10, nBits = 8, portable = true))
    assert(r >= 0.9, s"portable LSH recall too low: $r")
  }

  test("PORTABLE IVF at the q_knn_ivf shape (nList=32, nProbe=8) keeps recall ≥ 0.9") {
    val r = recall(Similarity.ivfTopK(corpus, queries, 10,
      nList = 32, nProbe = 8, portable = true))
    assert(r >= 0.9, s"portable IVF recall too low: $r")
  }

  test("PORTABLE persisted IVF at the q_knn_ivf_indexed shape keeps recall ≥ 0.9") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_recall").toString
    Similarity.saveIvfIndex(corpus, dir, nList = 32, portable = true)
    val r = recall(
      Similarity.ivfTopKIndexed(spark, dir, queries, 10, nProbe = 8))
    assert(r >= 0.9, s"portable persisted-IVF recall too low: $r")
  }

  test("PORTABLE PQ at the q_knn_pq shape (m=8, nBits=6, no-Lloyd seeds) keeps recall ≥ 0.9") {
    // the no-Lloyd lowest-id codebooks are a degenerate quantizer on
    // paper; the exact-cosine refine stage must still surface the true
    // neighborhood from the ADC shortlist
    val r = recall(Similarity.pqTopK(corpus, queries, 10,
      m = 8, nBits = 6, portable = true))
    assert(r >= 0.9, s"portable PQ recall too low: $r")
  }
}
