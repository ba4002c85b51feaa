package graft

import graft.graph.{GraphStore, PropertyGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraphStore.diff changelog semantics. */
class GraphDiffSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("diff reports adds/removes/changes; schema extension alone flags nothing") {
    val dir = java.nio.file.Files.createTempDirectory("gdiff").toString
    val store = new GraphStore(spark, dir)
    val n0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .withColumn("labels", array(lit("N")))
    val r0 = Seq((10L, 1L, 2L, "T")).toDF("id", "src", "dst", "type")
    store.commit(PropertyGraph(n0, r0))
    // v1: node 3 removed, node 4 added, node 2's name changed, node 1
    // untouched — but the snapshot gains a NEW column that stays null for
    // node 1 (exactly what UpdateOps schema extension produces). to_json
    // omits nulls, so the extension alone must not flag node 1.
    val n1 = Seq((1L, "a", null), (2L, "bb", null), (4L, "d", "x"))
      .toDF("id", "name", "extra")
      .withColumn("labels", array(lit("N")))
    store.commit(PropertyGraph(n1, r0))
    val d = store.diff(0, 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(d == Set(
      ("node", "added", 4L),
      ("node", "removed", 3L),
      ("node", "changed", 2L)), s"unexpected diff: $d")
  }
}
