package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join / two-phase distinct must equal their unsalted forms on a
  * skewed dataset (one key holds ~90% of rows). */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private lazy val fact = ((1L to 900L).map(i => (1L, i)) ++
    (1L to 100L).map(i => (1L + (i % 7), 1000L + i)))
    .toDF("k", "v")
  private lazy val dim = (1L to 8L).map(k => (k, s"name$k")).toDF("k", "nm")

  test("saltedJoin equals the plain join") {
    val plain = fact.join(dim, "k").groupBy("k", "nm")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 4).groupBy("k", "nm")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedDistinctCount equals count(DISTINCT) per key") {
    // duplicate values inside the hot key so distinctness matters
    val dups = fact.unionByName(fact.filter(col("k") === 1))
    val plain = dups.groupBy("k").agg(count_distinct(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(dups, "k", "v", salts = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
