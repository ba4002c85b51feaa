package graft

import graft.functions.expressions.IntArrayMaxAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the native int_array_max aggregate: elementwise max with
  * streaming folds (no collect_list buffering), across enough partitions
  * that serialize/deserialize + partial merge actually run. */
class IntArrayMaxAggSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("elementwise max across groups, many partitions") {
    IntArrayMaxAgg.ensureRegistered(spark)
    import spark.implicits._
    // per key k: rows i=0..9 with array [i, 10-i, k] → max = [9, 10, k]
    val df = (0 until 10).flatMap(i => Seq("a", "b").map(k => (k, i)))
      .toDF("k", "i").repartition(8)
      .withColumn("arr", array(col("i"),
        lit(10) - col("i"), when(col("k") === "a", 1).otherwise(2)))
    val r = df.groupBy("k")
      .agg(call_function("int_array_max", col("arr")).as("m"))
      .collect().map(x => x.getString(0) -> x.getSeq[Int](1)).toMap
    assert(r("a") == Seq(9, 10, 1))
    assert(r("b") == Seq(9, 10, 2))
  }

  test("null inputs are skipped; all-null group yields null") {
    IntArrayMaxAgg.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(("a", Some(Seq(1, 5))), ("a", None), ("b", None))
      .toDF("k", "arr").repartition(4)
    val r = df.groupBy("k")
      .agg(call_function("int_array_max", col("arr")).as("m"))
      .collect().map(x => x.getString(0) -> Option(x.get(1))).toMap
    assert(r("a").map(_.asInstanceOf[scala.collection.Seq[Int]].toList) ==
      Some(List(1, 5)))
    assert(r("b").isEmpty)
  }

  test("plan uses hash aggregation (ObjectHashAggregate), not sort agg") {
    IntArrayMaxAgg.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2)), (1L, Seq(2, 1))).toDF("k", "arr")
    val plan = df.groupBy("k")
      .agg(call_function("int_array_max", col("arr")).as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
