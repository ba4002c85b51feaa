package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Spatial points + distance (reference values/storable/PointValue.java,
 * CoordinateReferenceSystem.java: WGS-84 srid 4326, Cartesian srid 7203;
 * distance evaluated by the runtime's DistanceFunction). Points are
 * STRUCT<x: DOUBLE, y: DOUBLE, srid: INT> columns — columnar, filterable,
 * and bbox predicates push down to parquet min/max on the component
 * columns when stored unpacked.
 */
object Spatial {

  val SridWgs84 = 4326
  val SridCartesian = 7203

  def point(x: Column, y: Column, srid: Int = SridCartesian): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"), lit(srid).as("srid"))

  /** WGS-84 point: x = longitude, y = latitude (reference ordering). */
  def geoPoint(longitude: Column, latitude: Column): Column =
    point(longitude, latitude, SridWgs84)

  private val EarthRadiusMeters = 6378140.0 // reference CRS mean radius

  /** distance(p1, p2): euclidean for cartesian, haversine great-circle
    * (meters) for WGS-84 — dispatched on the srid like the reference's
    * per-CRS calculator. NULL for mixed-CRS pairs (reference returns null). */
  def distance(p1: Column, p2: Column): Column = {
    val dx = p1.getField("x") - p2.getField("x")
    val dy = p1.getField("y") - p2.getField("y")
    val euclid = sqrt(dx * dx + dy * dy)
    val lat1 = radians(p1.getField("y")); val lat2 = radians(p2.getField("y"))
    val dLat = radians(p2.getField("y") - p1.getField("y"))
    val dLon = radians(p2.getField("x") - p1.getField("x"))
    val a = pow(sin(dLat / 2), 2) + cos(lat1) * cos(lat2) * pow(sin(dLon / 2), 2)
    val haversine = lit(2.0 * EarthRadiusMeters) * asin(sqrt(a))
    when(p1.getField("srid") =!= p2.getField("srid"), lit(null))
      .when(p1.getField("srid") === SridWgs84, haversine)
      .otherwise(euclid)
  }

  /** point.withinBBox(p, lowerLeft, upperRight) — pure comparisons, so when
    * x/y are real columns the predicate reaches the parquet scan. */
  def withinBBox(p: Column, lowerLeft: Column, upperRight: Column): Column =
    p.getField("x") >= lowerLeft.getField("x") &&
      p.getField("x") <= upperRight.getField("x") &&
      p.getField("y") >= lowerLeft.getField("y") &&
      p.getField("y") <= upperRight.getField("y")
}
