package graft

import graft.ops.SpanningTree
import org.scalatest.funsuite.AnyFunSuite

/** Borůvka minimum spanning forest golden tests. */
class SpanningTreeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("MST picks the light triangle edges and the bridge") {
    // triangle 1-2-3 (weights 1,2,3) + node 4 via a heavy bridge
    val e = Seq(
      (10L, 1L, 2L, 1.0), (11L, 2L, 3L, 2.0), (12L, 3L, 1L, 3.0),
      (13L, 3L, 4L, 9.0)
    ).toDF("id", "src", "dst", "weight")
    assert(ids(SpanningTree.minimumSpanningForest(e)) == Set(10L, 11L, 13L))
  }

  test("weight ties break by edge id, making the forest unique") {
    // square with all weights equal: MST = the three smallest edge ids
    val e = Seq(
      (20L, 1L, 2L, 5.0), (21L, 2L, 3L, 5.0), (22L, 3L, 4L, 5.0),
      (23L, 4L, 1L, 5.0)
    ).toDF("id", "src", "dst", "weight")
    assert(ids(SpanningTree.minimumSpanningForest(e)) == Set(20L, 21L, 22L))
  }

  test("disconnected input yields a forest, one tree per component") {
    val e = Seq(
      (30L, 1L, 2L, 1.0), (31L, 2L, 1L, 7.0),   // parallel edge: keep 30
      (32L, 10L, 11L, 2.0), (33L, 11L, 12L, 3.0), (34L, 10L, 12L, 9.0)
    ).toDF("id", "src", "dst", "weight")
    assert(ids(SpanningTree.minimumSpanningForest(e)) == Set(30L, 32L, 33L))
  }
}
