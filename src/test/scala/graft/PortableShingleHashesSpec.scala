package graft

import graft.functions.{Dedup, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** portable_shingle_hashes must be bit-identical to
  * transform(shinglesOf(toks, n), s => portableHash64(s)) — including the
  * degenerate (< n tokens) whole-doc shingle, unicode text, and empty
  * token lists. */
class PortableShingleHashesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def legacy(toks: org.apache.spark.sql.Column, n: Int) =
    transform(TextFunctions.shinglesOf(toks, n), s => Dedup.portableHash64(s))

  test("bit-identical to the HOF spelling on varied corpora") {
    graft.functions.expressions.PortableShingleHashes.ensureRegistered(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                       // fewer tokens than shingle size
      "single",                    // one token
      "",                          // empty → one empty-string shingle
      "naïve café über straße",    // multi-byte UTF-8
      ("tok " * 400).trim)         // long doc
    val df = texts.toDF("text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    for (n <- Seq(2, 3, 5)) {
      val got = df.select(
        call_function("portable_shingle_hashes", col("toks"), lit(n)).as("nat"),
        legacy(col("toks"), n).as("leg")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("null token array → NULL, like the HOF spelling") {
    graft.functions.expressions.PortableShingleHashes.ensureRegistered(spark)
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
    val r = df.select(
      call_function("portable_shingle_hashes", col("toks"), lit(3)).as("nat"),
      legacy(col("toks"), 3).as("leg")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("interpreted eval path (no codegen) agrees") {
    graft.functions.expressions.PortableShingleHashes.ensureRegistered(spark)
    val df = Seq("alpha beta gamma delta").toDF("text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r = df.select(
        call_function("portable_shingle_hashes", col("toks"), lit(2)).as("nat"),
        legacy(col("toks"), 2).as("leg")).collect()(0)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
