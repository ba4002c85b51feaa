package graft

import graft.functions.{Durations, Orderability, Spatial}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ADVICE r9 regression: duration structs (months,days,seconds,nanos),
  * point structs (x,y,srid), and already-encoded orderability structs below
  * the column level must NOT silently encode as Cypher MAPs. Durations rank
  * as DURATION (ValueGroup.java:51) and compare by average length in
  * seconds with the reference's tiebreak chain (DurationValue.COMPARATOR);
  * points rank as GEOMETRY (ValueGroup.java:45) and compare CRS-first
  * (PointValue.compareTo). */
class OrderabilityTypedStructSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def encodedSortReprs(rows: Seq[(Long, org.apache.spark.sql.Column)]): Seq[String] = {
    val spark2 = spark
    import spark2.implicits._
    val base = rows.map(_._1).toDF("idx")
    val enc = rows.foldLeft(when(lit(false), lit(null))) {
      case (acc, (i, c)) => acc.when(col("idx") === i, c)
    }
    base.withColumn("__e", enc)
      .orderBy(col("__e").asc)
      .select(Orderability.repr(col("__e")))
      .collect().map(_.getString(0)).toSeq
  }

  test("duration orders by average length, not field-by-field") {
    // P1M (avg 2 629 746 s) sits between P30D (2 592 000 s) and P40D
    // (3 456 000 s) — a months-first struct compare would put P1M last
    val out = encodedSortReprs(Seq(
      0L -> Orderability.durationAt(0, Durations.duration(0, 40, 0, 0)),
      1L -> Orderability.durationAt(0, Durations.duration(1, 0, 0, 0)),
      2L -> Orderability.durationAt(0, Durations.duration(0, 30, 0, 0))))
    assert(out == Seq("P30D", "P1M", "P40D"))
  }

  test("equal-average durations tiebreak nanos, months, days, seconds") {
    // both are 2 629 746 avg seconds; the all-seconds form has months 0 <
    // 1 so it sorts first (reference COMPARATOR tiebreak chain)
    val out = encodedSortReprs(Seq(
      0L -> Orderability.durationAt(0, Durations.duration(1, 0, 0, 0)),
      1L -> Orderability.durationAt(0, Durations.duration(0, 0, 2629746L, 0))))
    assert(out.head.startsWith("PT") && out.last == "P1M")
  }

  test("type ranks: map < list < point < duration < string") {
    val mapEnc = Orderability.encodeAny(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType))),
      struct(lit(1L).as("a"))).get
    val out = encodedSortReprs(Seq(
      0L -> Orderability.string(lit("zz")),
      1L -> Orderability.durationAt(0, Durations.duration(0, 0, 1, 0)),
      2L -> Orderability.pointAt(0, Spatial.point(lit(1.0), lit(2.0))),
      3L -> Orderability.list(array(lit(1L)), Orderability.elemNumber),
      4L -> mapEnc))
    assert(out == Seq("{a: 1}", "[1]",
      "point({x: 1.0, y: 2.0, crs: 'cartesian'})", "PT1S", "zz"))
  }

  test("points compare srid first, then x, then y") {
    val out = encodedSortReprs(Seq(
      0L -> Orderability.pointAt(0, Spatial.point(lit(9.0), lit(9.0), Spatial.SridCartesian)),
      1L -> Orderability.pointAt(0, Spatial.point(lit(1.0), lit(2.0), Spatial.SridWgs84)),
      2L -> Orderability.pointAt(0, Spatial.point(lit(9.0), lit(1.0), Spatial.SridCartesian))))
    // wgs-84 srid 4326 < cartesian 7203; within cartesian, y breaks the tie
    assert(out == Seq(
      "point({x: 1.0, y: 2.0, crs: 'wgs-84'})",
      "point({x: 9.0, y: 1.0, crs: 'cartesian'})",
      "point({x: 9.0, y: 9.0, crs: 'cartesian'})"))
  }

  test("duration repr matches prettyPrint shapes") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(1).toDF("one").select(
      Orderability.repr(Orderability.durationAt(0,
        Durations.duration(0, 0, 0, 0))).as("zero"),
      Orderability.repr(Orderability.durationAt(0,
        Durations.duration(14, 3, 3661, 500000000L))).as("full"),
      Orderability.repr(Orderability.durationAt(0,
        Durations.duration(0, 0, -1, 500000000L))).as("negSub"))
    val r = df.collect().head
    assert(r.getString(0) == "PT0S")
    assert(r.getString(1) == "P1Y2M3DT1H1M1.5S")
    assert(r.getString(2) == "PT-0.5S")
  }

  test("encoderAt dispatches typed structs and rejects encoded-below-top") {
    import org.apache.spark.sql.types._
    val durT = StructType(Orderability.DurationFields.map(
      StructField(_, LongType)))
    val pointT = StructType(Seq(StructField("x", DoubleType),
      StructField("y", DoubleType), StructField("srid", IntegerType)))
    assert(Orderability.encoderAt(0, durT).isDefined)
    assert(Orderability.encoderAt(1, pointT).isDefined)
    // a duration inside a list still encodes as DURATION, not MAP
    val listOfDur = ArrayType(durT)
    assert(Orderability.encoderAt(0, listOfDur).isDefined)
    // the encoded layout passes through at the top level and RE-NESTS
    // (sinkElem) when embedded deeper — `[encoded, …]` is legal
    val encT = StructType(Seq(StructField("rank", IntegerType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("d", DoubleType),
      StructField("l", ArrayType(StringType)),
      StructField("repr", StringType)))
    assert(Orderability.encoderAt(1, encT).isDefined) // sinkElem re-nest
    assert(Orderability.encoderAt(0, encT).isDefined) // identity
  }

  test("a list of durations orders element-wise by duration semantics") {
    val mk = (m: Long, d: Long) => Durations.duration(m, d, 0, 0)
    val out = encodedSortReprs(Seq(
      0L -> Orderability.listOfEncodedAt(0,
        array(Orderability.durationAt(1, mk(1, 0)))),
      1L -> Orderability.listOfEncodedAt(0,
        array(Orderability.durationAt(1, mk(0, 30))))))
    assert(out == Seq("[P30D]", "[P1M]"))
  }
}
