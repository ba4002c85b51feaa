package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** minhash_sigs must equal the column-per-coefficient spelling it
  * replaced: array(j)(array_min(transform(hs, x => pmod(x*a_j+b_j, P))))
  * with (a_j, b_j) from Random(42), P = 2^31−1 — including the NULL
  * corners (NULL input → [NULL×k], NULL elements skipped, empty → all
  * NULL slots). */
class MinhashSigsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val Prime = 2147483647L
  private def legacySigs(hs: org.apache.spark.sql.Column, k: Int) = {
    val rng = new scala.util.Random(42)
    val coeffs = Array.fill(k)(
      (1L + rng.nextInt((Prime - 1).toInt), rng.nextInt(Prime.toInt).toLong))
    array(coeffs.map { case (a, b) =>
      array_min(transform(hs, x => pmod(x * a + b, lit(Prime))))
    }.toIndexedSeq: _*)
  }

  test("equals the legacy spelling on random shingle-hash arrays") {
    graft.functions.expressions.MinhashSigs.ensureRegistered(spark)
    val rng = new scala.util.Random(3)
    val rows = Seq.fill(100)(
      Array.fill(1 + rng.nextInt(200))(rng.nextLong().abs % Prime))
    val df = rows.toDF("hs")
    val got = df.select(
      call_function("minhash_sigs", col("hs"), lit(64)).as("nat"),
      legacySigs(col("hs"), 64).as("leg")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("NULL corners: null input, null elements, empty array") {
    graft.functions.expressions.MinhashSigs.ensureRegistered(spark)
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(5L), None, Some(9L)))),
      (2L, Some(Seq[Option[Long]]())),          // empty
      (3L, None)                                 // null input
    ).toDF("id", "hs")
    val got = df
      .select(col("id"), call_function("minhash_sigs", col("hs"), lit(4)).as("nat"),
        legacySigs(col("hs"), 4).as("leg"))
      .orderBy("id").collect()
    // row 1: nulls skipped — equal to legacy
    assert(got(0).getSeq[Any](1) == got(0).getSeq[Any](2))
    // row 2 (empty): all-NULL slots, like legacy
    assert(got(1).getSeq[Any](1) == Seq(null, null, null, null))
    assert(got(1).getSeq[Any](1) == got(1).getSeq[Any](2))
    // row 3 (NULL input): legacy yields [NULL×k], the native must too
    assert(got(2).getSeq[Any](1) == Seq(null, null, null, null))
    assert(got(2).getSeq[Any](1) == got(2).getSeq[Any](2))
  }

  test("interpreted eval path (no codegen) agrees") {
    graft.functions.expressions.MinhashSigs.ensureRegistered(spark)
    val df = Seq(Seq(17L, 4242L, 99999L)).toDF("hs")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r = df.select(
        call_function("minhash_sigs", col("hs"), lit(16)).as("nat"),
        legacySigs(col("hs"), 16).as("leg")).collect()(0)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
