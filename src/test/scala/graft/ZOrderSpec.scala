package graft

import graft.functions.Spatial
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton math, pruned-but-lossless bbox queries. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("mortonCode interleaves quantized bits (hand-checked cells)") {
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (2.0, 1.0))
      .toDF("x", "y")
      .select(Spatial.mortonCode(col("x"), col("y"), 0.0, 4.0, 0.0, 4.0,
        bits = 2).as("z"))
    // quantize to 2-bit cells (cell = value since range/cells = 1):
    // (0,0)->0; (3,0)->qx=3 -> bits 1,1 at pos 0,2 -> 5; (0,3)->qy=3 -> 10;
    // (3,3)->15; (2,1)-> qx=2 (pos2), qy=1 (pos1) -> 4+2=6
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 5L, 10L, 15L, 6L))
  }

  test("bbox query over the z-layout equals the direct filter AND prunes") {
    val pts = (1L to 2000L).map(i =>
      (i, (i % 53).toDouble, (i % 47).toDouble)).toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Spatial.saveZOrdered(pts, "x", "y", dir, 0.0, 53.0, 0.0, 47.0,
      bits = 10, prefixBits = 4)
    val q = Spatial.queryBBox(spark, dir, 5.0, 7.0, 15.0, 17.0)
    val got = q.select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter(col("x").between(5, 15) && col("y").between(7, 17))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // pruning: the scan must carry a PartitionFilters entry on zbucket
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("PartitionFilters"))
    assert(scanLine.exists(_.contains("zbucket")),
      s"bbox scan not partition-pruned:\n${plan.take(1500)}")
    // and the box must touch strictly fewer curve cells than exist
    val touched = q.select("zbucket").distinct().count()
    val total = spark.read.parquet(dir).select("zbucket").distinct().count()
    assert(touched < total, s"no pruning: $touched of $total buckets")
  }
}
