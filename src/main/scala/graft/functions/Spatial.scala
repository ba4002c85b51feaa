package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Quantize v in [min, max] to an integer cell in [0, 2^bits). */
  private def quantize(v: Column, min: Double, max: Double, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((v - min) / (max - min) * cells).cast("long")))
  }

  /**
   * Morton (Z-order) code of a quantized (x, y): bit-interleaved so
   * points close in 2-D space are close on the 1-D curve — the layout
   * primitive behind spatially-clustered storage (the point-index role
   * of the reference's space-filling-curve index,
   * community/kernel/.../index/schema/SpaceFillingCurve — same curve,
   * columnar instead of a B-tree). Pure arithmetic fold (no UDF, no
   * shift-by-column): bit i of each coordinate lands at position 2i
   * (x) / 2i+1 (y) via exact power-of-two multiplication.
   */
  def mortonCode(x: Column, y: Column, minX: Double, maxX: Double,
      minY: Double, maxY: Double, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 24, s"morton bits out of range: $bits")
    val qx = quantize(x, minX, maxX, bits)
    val qy = quantize(y, minY, maxY, bits)
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) => {
      val p2i = pow(lit(2.0), i.cast("double")).cast("long")        // 2^i
      val p4i = pow(lit(4.0), i.cast("double")).cast("long")        // 2^(2i)
      // Column `/` is floating division — truncate back to integer bits
      // (operands non-negative and < 2^24, exact in double)
      val xb = (qx / p2i).cast("long") % 2L
      val yb = (qy / p2i).cast("long") % 2L
      acc + xb * p4i + yb * p4i * 2L
    })
  }

  /**
   * Z-ordered spatial layout: write the frame partitioned by the top
   * `prefixBits` of the Morton code, clustered within partitions by the
   * full code. A bbox query then reads ONLY the partitions whose curve
   * prefix intersects the box — at 100 TB that is file-level pruning by
   * geometry, the thing a bare (x, y) sort cannot give (it clusters one
   * axis only). prefixBits must be even (a prefix cell is a square of
   * top-bit pairs).
   */
  def saveZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      minX: Double, maxX: Double, minY: Double, maxY: Double,
      bits: Int = 16, prefixBits: Int = 6): Unit = {
    require(prefixBits % 2 == 0 && prefixBits > 0 && prefixBits <= 2 * bits,
      s"prefixBits must be even in (0, 2*bits]: $prefixBits")
    val z = mortonCode(col(xCol), col(yCol), minX, maxX, minY, maxY, bits)
    df.withColumn("__z", z)
      .withColumn("zbucket", (col("__z") / (1L << (2 * bits - prefixBits))).cast("long"))
      .repartition(col("zbucket"))
      .sortWithinPartitions("zbucket", "__z")
      .drop("__z")
      .write.mode("overwrite").partitionBy("zbucket")
      .parquet(path)
    // layout metadata so the query side reproduces the exact curve
    // (underscore-prefixed dirs are invisible to the table scan)
    import df.sparkSession.implicits._
    Seq((minX, maxX, minY, maxY, bits, prefixBits, xCol, yCol))
      .toDF("minX", "maxX", "minY", "maxY", "bits", "prefixBits", "xcol", "ycol")
      .write.mode("overwrite").parquet(s"$path/_layout")
  }

  /** Bbox query against a Z-ordered layout: enumerate the curve-prefix
    * cells intersecting the box (driver-side, bounded by the prefix grid
    * ≤ 2^prefixBits cells), prune partitions to those buckets, then apply
    * the exact predicate. */
  def queryBBox(spark: SparkSession, path: String,
      loX: Double, loY: Double, hiX: Double, hiY: Double): DataFrame = {
    val l = spark.read.parquet(s"$path/_layout").first()
    val (minX, maxX, minY, maxY) = (l.getDouble(0), l.getDouble(1),
      l.getDouble(2), l.getDouble(3))
    val bits = l.getInt(4); val prefixBits = l.getInt(5)
    val (xc, yc) = (l.getString(6), l.getString(7))
    val side = prefixBits / 2 // bits per axis at prefix level
    def cellOf(v: Double, mn: Double, mx: Double): Long = {
      val q = math.floor((v - mn) / (mx - mn) * (1L << side)).toLong
      math.min((1L << side) - 1, math.max(0L, q))
    }
    def interleave(qx: Long, qy: Long): Long =
      (0 until side).map(i =>
        (((qx >> i) & 1L) << (2 * i)) | (((qy >> i) & 1L) << (2 * i + 1)))
        .foldLeft(0L)(_ | _)
    val buckets = (for {
      i <- cellOf(loX, minX, maxX) to cellOf(hiX, minX, maxX)
      j <- cellOf(loY, minY, maxY) to cellOf(hiY, minY, maxY)
    } yield interleave(i, j)).distinct
    spark.read.parquet(path)
      .filter(col("zbucket").isin(buckets: _*))
      .filter(col(xc) >= loX && col(xc) <= hiX &&
        col(yc) >= loY && col(yc) <= hiY)
  }
}
