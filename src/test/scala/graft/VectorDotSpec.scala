package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native vector_dot expression must be bit-identical to the HOF
  * spelling it replaced (aggregate(zip_with(a, b, _*_), 0.0, _+_)) —
  * including every NULL/shape corner the HOF semantics imply. */
class VectorDotSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("matches the HOF formulation bit-for-bit on random vectors") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rng.nextDouble() * 2 - 1),
      Array.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("nat"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      // bit-identical, not approximately equal: same fold order
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("NULL corners: null operand, length mismatch, null element, empty") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),   // 11.0
      (None, Some(Array(1.0))),                          // null operand
      (Some(Array(1.0, 2.0)), Some(Array(1.0))),         // length mismatch
      (Some(Array[Double]()), Some(Array[Double]()))     // empty → 0.0
    ).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
    assert(got(3).getDouble(0) == 0.0)

    // null ELEMENT poisons, exactly like the HOF fold
    val withNullElem = spark.sql(
      "SELECT vector_dot(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) v")
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("interpreted eval path (no codegen) agrees") {
    val df = Seq((Array(1.5, -2.0, 0.25), Array(4.0, 0.5, 8.0))).toDF("a", "b")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val v = df.select(Similarity.dot(col("a"), col("b"))).first().getDouble(0)
      assert(v == 1.5 * 4.0 + (-2.0) * 0.5 + 0.25 * 8.0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
