package graft

import graft.ops.UpdateOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the updating operators (reference CreatePipe /
  * MergePipe match-or-create / SetPipe / DeletePipe semantics:
  * DELETE-with-rels must fail, DETACH cascades, MERGE ON MATCH vs
  * ON CREATE branches). */
class UpdateOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def chain3 = GraphFixtures.chainGraph(spark, 3) // 0->1->2

  test("createNodes appends with conformed schema (absent props NULL)") {
    val g = chain3
    val newNodes = Seq((10L, Seq("N"))).toDF("id", "labels")
    val g2 = UpdateOps.createNodes(g, newNodes)
    assert(g2.nodes.count() === 4)
    val added = g2.nodes.filter(col("id") === 10L).collect()(0)
    assert(added.getAs[String]("name") == null)
  }

  test("createRels appends relationships") {
    val g = chain3
    val newRels = Seq((999L, 2L, 0L, "T")).toDF("id", "src", "dst", "type")
    val g2 = UpdateOps.createRels(g, newRels)
    assert(g2.rels.count() === 3)
    assert(g2.rels.filter(col("src") === 2L && col("dst") === 0L).count() === 1)
  }

  test("mergeNodes: ON MATCH updates, unmatched source rows insert") {
    val g = chain3
    // node 1 exists (match), node 42 doesn't (create)
    val delta = Seq((1L, Seq("N"), "updated"), (42L, Seq("M"), "fresh"))
      .toDF("id", "labels", "name")
    val g2 = UpdateOps.mergeNodes(g, delta,
      onMatch = Map("name" -> col("src_name")))
    assert(g2.nodes.count() === 4)
    val byId = g2.nodes.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(byId(1L) === "updated")
    assert(byId(42L) === "fresh")
    assert(byId(0L) === "n0") // untouched rows keep their values
  }

  test("mergeNodes ON CREATE expression applies only to inserts") {
    val g = chain3
    val delta = Seq((0L, "x"), (50L, "y")).toDF("id", "name")
    val g2 = UpdateOps.mergeNodes(g, delta,
      onCreate = Map("name" -> concat(lit("new_"), col("src_name"))))
    val byId = g2.nodes.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(byId(50L) === "new_y")
    assert(byId(0L) === "n0") // matched without onMatch → unchanged
  }

  test("mergeRels: matched on (src,dst,type) updates, unmatched inserts") {
    val g = chain3 // rels 100:0->1, 101:1->2
    val delta = Seq((200L, 0L, 1L, "T"), (201L, 2L, 0L, "T"))
      .toDF("id", "src", "dst", "type")
    val g2 = UpdateOps.mergeRels(g, delta)
    assert(g2.rels.count() === 3) // 0->1 matched (kept id 100), 2->0 inserted
    val ids = g2.rels.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(100L, 101L, 201L))
  }

  test("setLabels adds/removes and deduplicates the id input") {
    val g = chain3
    val ids = Seq(1L, 1L, 1L).toDF("id") // duplicate MATCH output
    val g2 = UpdateOps.setLabels(g, ids, add = Seq("Extra"), remove = Seq("N"))
    assert(g2.nodes.count() === 3) // duplicates must not multiply rows
    val labels = g2.nodes.filter(col("id") === 1L)
      .select("labels").collect()(0).getSeq[String](0)
    assert(labels === Seq("Extra"))
    assert(g2.nodes.filter(col("id") === 0L)
      .select("labels").collect()(0).getSeq[String](0) === Seq("N"))
  }

  test("setNodeProperties sets several props on deduplicated ids") {
    val g = chain3
    val ids = Seq(0L, 0L, 2L).toDF("id")
    val g2 = UpdateOps.setNodeProperties(g, ids, Map("name" -> lit("renamed")))
    assert(g2.nodes.count() === 3)
    val byId = g2.nodes.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(byId(0L) === "renamed" && byId(2L) === "renamed" && byId(1L) === "n1")
  }

  test("setRelProperties updates only matching rel ids") {
    val g = chain3
    val g2 = UpdateOps.setRelProperties(g, Seq(100L).toDF("id"),
      Map("type" -> lit("U")))
    val types = g2.rels.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("type")).toMap
    assert(types(100L) === "U" && types(101L) === "T")
  }

  test("plain DELETE fails on nodes with incident rels (Cypher semantics)") {
    val g = chain3
    val err = intercept[IllegalArgumentException] {
      UpdateOps.deleteNodes(g, Seq(1L).toDF("id"), detach = false).nodes.count()
    }
    assert(err.getMessage.contains("DETACH"))
  }

  test("plain DELETE succeeds on isolated nodes") {
    val g = UpdateOps.createNodes(chain3, Seq((10L, Seq("N"))).toDF("id", "labels"))
    val g2 = UpdateOps.deleteNodes(g, Seq(10L).toDF("id"), detach = false)
    assert(g2.nodes.count() === 3)
    assert(g2.rels.count() === 2)
  }

  test("DETACH DELETE cascades to incident rels in both directions") {
    val g = chain3
    val g2 = UpdateOps.deleteNodes(g, Seq(1L).toDF("id"), detach = true)
    assert(g2.nodes.select("id").collect().map(_.getLong(0)).toSet === Set(0L, 2L))
    assert(g2.rels.count() === 0) // both 0->1 and 1->2 removed
  }

  test("deleteRels removes by rel id only") {
    val g = chain3
    val g2 = UpdateOps.deleteRels(g, Seq(100L).toDF("id"))
    assert(g2.rels.select("id").collect().map(_.getLong(0)).toSet === Set(101L))
    assert(g2.nodes.count() === 3)
  }

  test("assertSameNode passes when seeks agree, fails the job otherwise") {
    import spark.implicits._
    val ok = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(UpdateOps.assertSameNode(ok, "a", "b").count() == 2)
    val bad = Seq((1L, 2L)).toDF("a", "b")
    intercept[Exception] {
      UpdateOps.assertSameNode(bad, "a", "b").count()
    }
  }
}
