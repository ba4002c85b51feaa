package graft

import graft.functions.{Durations, Spatial}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the duration 4-field type and spatial points —
  * semantics pinned to the reference (DurationValue.java, PointValue.java). */
class TypesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def one = spark.range(1)

  test("ISO-8601 duration parsing keeps calendar components separate") {
    val r = one.select(Durations.parseIso(lit("P1Y2M3DT4H5M6.5S")).as("d"))
      .select("d.months", "d.days", "d.seconds", "d.nanos").collect()(0)
    assert(r.getLong(0) == 14 && r.getLong(1) == 3 &&
      r.getLong(2) == 4 * 3600 + 5 * 60 + 6 && r.getLong(3) == 500000000L)
    val w = one.select(Durations.parseIso(lit("P2W")).as("d"))
      .select("d.days").collect()(0)
    assert(w.getLong(0) == 14)
  }

  test("duration arithmetic: plus, minus, times, normalize carry") {
    val a = Durations.duration(1, 2, 3, 800000000L)
    val b = Durations.duration(0, 1, 1, 400000000L)
    val r = one.select(Durations.normalized(Durations.plus(a, b)).as("d"))
      .select("d.months", "d.days", "d.seconds", "d.nanos").collect()(0)
    // 3s+1s, 0.8+0.4ns-parts carry → 5s 200ms
    assert(r.getLong(0) == 1 && r.getLong(1) == 3 &&
      r.getLong(2) == 5 && r.getLong(3) == 200000000L)
    val t2 = one.select(Durations.times(a, lit(3)).as("d")).select("d.days").collect()(0)
    assert(t2.getLong(0) == 6)
  }

  test("duration.between honors month borrow; date addition is calendar-aware") {
    val r = one.select(Durations.betweenDates(
      to_date(lit("2020-01-31")), to_date(lit("2020-03-01"))).as("d"))
      .select("d.months", "d.days").collect()(0)
    // 2020-01-31 + 1 month = 2020-02-29 (leap), +1 day = 2020-03-01
    assert(r.getLong(0) == 1 && r.getLong(1) == 1)
    val added = one.select(Durations.addToDate(to_date(lit("2020-01-31")),
      Durations.duration(1, 1, 0, 0)).cast("string")).collect()(0).getString(0)
    assert(added == "2020-03-01")
  }

  test("addToTimestamp preserves time-of-day across the calendar jump") {
    val r = one.select(Durations.addToTimestamp(
      to_timestamp(lit("2020-01-31 10:30:00")),
      Durations.duration(1, 0, 60, 0)).cast("string")).collect()(0).getString(0)
    assert(r == "2020-02-29 10:31:00")
  }

  test("cartesian distance is euclidean, wgs84 is haversine meters") {
    val c = one.select(Spatial.distance(
      Spatial.point(lit(0.0), lit(0.0)), Spatial.point(lit(3.0), lit(4.0))).as("d"))
      .collect()(0).getDouble(0)
    assert(c == 5.0)
    // one degree of longitude at the equator ≈ 111.3 km on the 6378140 sphere
    val g = one.select(Spatial.distance(
      Spatial.geoPoint(lit(0.0), lit(0.0)), Spatial.geoPoint(lit(1.0), lit(0.0))).as("d"))
      .collect()(0).getDouble(0)
    assert(math.abs(g - 111319.0) < 100.0)
    // mixed CRS → NULL, matching the reference
    val m = one.select(Spatial.distance(
      Spatial.point(lit(0.0), lit(0.0)), Spatial.geoPoint(lit(1.0), lit(0.0))).as("d"))
      .collect()(0)
    assert(m.isNullAt(0))
  }

  test("withinBBox bounds inclusively") {
    val in = one.select(Spatial.withinBBox(Spatial.point(lit(5.0), lit(5.0)),
      Spatial.point(lit(0.0), lit(0.0)), Spatial.point(lit(5.0), lit(10.0))).as("b"))
      .collect()(0).getBoolean(0)
    assert(in)
  }

  test("mixed-type COLUMNS from UNION branches lift into orderability") {
    import graft.cypher.Cypher
    val g = GraphFixtures.nodeGraph(spark, 1)
    // top level: UNION of long / string / boolean columns resolves and
    // decodes to toString() text; UNION DISTINCT dedups with value
    // semantics (long 1 and string '1' stay distinct)
    val vals = Cypher.run(spark, g,
      "RETURN 1 AS v UNION RETURN '1' AS v UNION RETURN true AS v")
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("1", "true") || vals.size == 3,
      s"long 1 vs string '1' collapsed: $vals")
    assert(Cypher.run(spark, g,
      "RETURN 1 AS v UNION RETURN '1' AS v UNION RETURN true AS v")
      .count() == 3)
    // nested CALL {} union keeps the encoding: outer ORDER BY follows the
    // global type-rank order String < Boolean < Number
    val ordered = Cypher.run(spark, g,
      """CALL { RETURN 10 AS v UNION ALL RETURN 'b' AS v
        |       UNION ALL RETURN false AS v }
        |RETURN toString(v) AS s ORDER BY v""".stripMargin)
      .collect().map(_.getString(0)).toList
    assert(ordered == List("b", "false", "10"))
    // min/max over a genuinely mixed COLUMN follow orderability
    val mm = Cypher.run(spark, g,
      """CALL { RETURN 5 AS v UNION ALL RETURN 'a' AS v
        |       UNION ALL RETURN true AS v UNION ALL RETURN 2.5 AS v }
        |RETURN toString(min(v)) AS lo, toString(max(v)) AS hi""".stripMargin)
      .collect()(0)
    assert(mm.getString(0) == "a" && mm.getString(1) == "5")
  }

  test("LIST columns participate in cross-type orderability") {
    import graft.cypher.Cypher
    val g = GraphFixtures.nodeGraph(spark, 1)
    // union of list / string / number columns: lists rank below strings;
    // lists order element-wise with the global element order
    val ordered = Cypher.run(spark, g,
      """CALL { RETURN [2, 1] AS v UNION ALL RETURN 'a' AS v
        |       UNION ALL RETURN [1, 9] AS v UNION ALL RETURN 7 AS v }
        |RETURN toString(v) AS s ORDER BY v""".stripMargin)
      .collect().map(_.getString(0)).toList
    assert(ordered == List("[1, 9]", "[2, 1]", "a", "7"))
    // shorter list first on a prefix tie; min picks the smallest list
    val mm = Cypher.run(spark, g,
      """CALL { RETURN [1, 2, 3] AS v UNION ALL RETURN [1, 2] AS v
        |       UNION ALL RETURN 'z' AS v }
        |RETURN toString(min(v)) AS lo, toString(max(v)) AS hi""".stripMargin)
      .collect()(0)
    assert(mm.getString(0) == "[1, 2]" && mm.getString(1) == "z")
    // mixed LITERAL list with a nested list element sorts by rank too
    val lit = Cypher.run(spark, g,
      "UNWIND [[2], 'x', 3, null] AS v RETURN toString(v) AS s ORDER BY v")
      .collect().map(_.getString(0)).toList
    assert(lit == List("[2]", "x", "3", "null"))
  }

  test("unicode_normalize composes NFD input under NFC (native expression)") {
    val r = one.select(call_function("unicode_normalize",
      lit("café"), lit("NFC")).as("s")).collect()(0).getString(0)
    assert(r == "café" && r.length == 4)
    val d = one.select(call_function("unicode_normalize",
      lit("café"), lit("NFD")).as("s")).collect()(0).getString(0)
    assert(d.length == 5)
  }
}
