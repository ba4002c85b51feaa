package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(Tuple1(text)).toDF("t").select(c).first().getAs[T](0)

  test("tokens splits on whitespace and drops empties") {
    assert(one[Seq[String]](tokens(col("t")), "a  b\t c\nd ") === Seq("a", "b", "c", "d"))
  }

  test("tokenCount and bpeTokenCount") {
    assert(one[Int](tokenCount(col("t")), "hello world 42!") === 3)
    // bpe-ish: [hello][world][4][2][!]
    assert(one[Int](bpeTokenCount(col("t")), "hello world 42!") === 5)
  }

  test("langId flags stopword-rich text as en") {
    assert(one[String](langId(col("t")), "the cat sat on the mat with a hat") === "en")
    assert(one[String](langId(col("t")), "xyzzy plugh zork grue frobozz") === "other")
  }

  test("shingles produce word n-grams, short docs collapse to one") {
    assert(one[Seq[String]](shingles(col("t"), 2), "a b c") === Seq("a b", "b c"))
    assert(one[Seq[String]](shingles(col("t"), 5), "a b") === Seq("a b"))
  }

  test("wordSetFingerprint is word-order insensitive") {
    val a = one[String](wordSetFingerprint(col("t")), "b a c")
    val b = one[String](wordSetFingerprint(col("t")), "c b a a")
    assert(a === b)
  }

  test("rollingHashFingerprint is order sensitive") {
    val a = one[Long](rollingHashFingerprint(col("t")), "a b")
    val b = one[Long](rollingHashFingerprint(col("t")), "b a")
    assert(a !== b)
  }

  test("repetition signals: duplicate lines, top/duplicate bigram coverage") {
    // 4 non-empty lines, 2 distinct → (4-2)/4 duplicated
    val spammy = "spam spam\nreal line one\nspam spam\nspam spam"
    assert(one[Double](duplicateLineFraction(col("t")), spammy) === 0.5)
    assert(one[Double](duplicateLineFraction(col("t")), "a\nb\nc") === 0.0)
    assert(one[Double](duplicateLineFraction(col("t")), "") === 0.0)
    // "buy now buy now buy now": bigrams = [buy now, now buy, buy now,
    // now buy, buy now] → top = "buy now"×3 → 3*2/6 tokens = 1.0
    assert(one[Double](topNgramFraction(col("t"), 2), "buy now buy now buy now") === 1.0)
    val varied = one[Double](topNgramFraction(col("t"), 2), "all words here are different ones")
    assert(varied < 0.5)
    // duplicated bigrams: 5 bigrams, 2 distinct → 3 dups × 2 / 6, capped 1.0
    val dupFrac = one[Double](duplicateNgramFraction(col("t"), 2), "buy now buy now buy now")
    assert(dupFrac === 1.0)
    // 4 bigrams, 3 distinct → 1 dup × 2 / 5 tokens
    val partial = one[Double](duplicateNgramFraction(col("t"), 2), "a b a b c")
    assert(math.abs(partial - 2.0 / 5.0) < 1e-12)
    assert(one[Double](duplicateNgramFraction(col("t"), 2), "a b c d") === 0.0)
  }

  test("charEntropy matches hand-computed distributions") {
    assert(one[Double](charEntropy(col("t")), "aaaa") === 0.0)
    assert(one[Double](charEntropy(col("t")), "abab") === 1.0)
    assert(one[Double](charEntropy(col("t")), "abcd") === 2.0)
    assert(one[Double](charEntropy(col("t")), "") === 0.0)
    val aab = one[Double](charEntropy(col("t")), "aab")
    val expected = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)) / math.log(2)
    assert(math.abs(aab - expected) < 1e-12)
    // newlines are excluded: "a\nb" has 2 counted chars, entropy 1.0
    assert(one[Double](charEntropy(col("t")), "a\nb") === 1.0)
  }

  test("qualityScore in [0,1], higher for natural text") {
    val nat = one[Double](qualityScore(col("t")),
      "The quick brown fox jumps over the lazy dog and runs through the field with great joy.")
    val junk = one[Double](qualityScore(col("t")), "!!! ??? ,,, ;;; ...")
    assert(nat > junk)
    assert(nat >= 0.0 && nat <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }
}
