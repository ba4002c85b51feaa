package graft

import graft.functions.Orderability
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the cross-type orderability encoding: sorting by the
  * encoded struct must reproduce the CIP global order (String < Boolean <
  * Number, NULL last ascending / first descending; numbers numeric across
  * Long/Double; strings binary) on randomly generated mixed value sets —
  * not just the hand-picked spec examples. */
class OrderabilityPropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private sealed trait V
  private case class VS(v: String) extends V
  private case class VB(v: Boolean) extends V
  private case class VL(v: Long) extends V
  private case class VD(v: Double) extends V
  private case object VNull extends V

  private val gen: Gen[V] = Gen.frequency(
    4 -> Gen.listOfN(6, Gen.choose(' ', '~')).map(cs => VS(cs.mkString)),
    2 -> Gen.oneOf(true, false).map(VB.apply),
    4 -> Gen.choose(-1000000L, 1000000L).map(VL.apply),
    4 -> Gen.choose(-1e6, 1e6).map(VD.apply),
    2 -> Gen.const(VNull))

  private def sample(n: Int, seed: Long): Seq[V] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  /** CIP reference comparator: ≤ 0 when a sorts no later than b. */
  private def cmp(a: V, b: V): Int = {
    def rank(v: V): Int = v match {
      case _: VS => 0; case _: VB => 1; case _: VL | _: VD => 2
      case VNull => 3
    }
    val r = rank(a) - rank(b)
    if (r != 0) r
    else (a, b) match {
      case (VS(x), VS(y)) => x.compareTo(y)
      case (VB(x), VB(y)) => x.compareTo(y)
      case (x, y) =>
        def num(v: V): Double = v match {
          case VL(l) => l.toDouble; case VD(d) => d; case _ => 0.0
        }
        java.lang.Double.compare(num(x), num(y))
    }
  }

  private def sortedByEncoding(vs: Seq[V], asc: Boolean): Seq[V] = {
    val spark2 = spark
    import spark2.implicits._
    val rows = vs.zipWithIndex.map { case (v, i) =>
      v match {
        case VS(s)  => (i.toLong, "s", s, false, 0L, 0.0)
        case VB(b)  => (i.toLong, "b", "", b, 0L, 0.0)
        case VL(l)  => (i.toLong, "l", "", false, l, 0.0)
        case VD(d)  => (i.toLong, "d", "", false, 0L, d)
        case VNull  => (i.toLong, "z", "", false, 0L, 0.0)
      }
    }
    val df = rows.toDF("idx", "kind", "s", "b", "dl", "dd")
    val enc = when(col("kind") === "s", Orderability.string(col("s")))
      .when(col("kind") === "b", Orderability.boolean(col("b")))
      .when(col("kind") === "l", Orderability.number(col("dl")))
      .when(col("kind") === "d", Orderability.number(col("dd")))
      .otherwise(Orderability.nullValue)
    val sorted = df.withColumn("__e", enc)
      .orderBy(if (asc) col("__e").asc else col("__e").desc)
      .select("idx").collect().map(_.getLong(0).toInt)
    sorted.map(vs(_)).toSeq
  }

  test("ascending encoded sort is non-decreasing under the CIP comparator") {
    for (seed <- Seq(11L, 42L, 1789L)) {
      val vs = sample(120, seed)
      val sorted = sortedByEncoding(vs, asc = true)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(cmp(a, b) <= 0, s"out of order: $a !<= $b (seed $seed)")
        case _ => ()
      }
      // nulls land at the very end ascending
      val nullBlock = sorted.dropWhile(_ != VNull)
      assert(nullBlock.forall(_ == VNull), s"null not last (seed $seed)")
    }
  }

  // ---- nested values: lists-of-lists and maps ---------------------------

  private sealed trait W
  private case class WNum(v: Long) extends W
  private case class WStr(v: String) extends W
  private case class WBool(v: Boolean) extends W
  private case object WNull extends W
  private case class WList(xs: List[W]) extends W
  private case class WMap(m: Map[String, Long]) extends W

  private def wGen(depth: Int): Gen[W] = {
    val scalar = Gen.frequency(
      3 -> Gen.choose(-99L, 99L).map(WNum.apply),
      3 -> Gen.listOfN(3, Gen.alphaChar).map(cs => WStr(cs.mkString)),
      1 -> Gen.oneOf(true, false).map(WBool.apply),
      1 -> Gen.const(WNull))
    if (depth >= 2) scalar
    else Gen.frequency(
      4 -> scalar,
      3 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, wGen(depth + 1)).map(WList.apply)),
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.listOfN(2, Gen.alphaChar).map(_.mkString),
          Gen.choose(-9L, 9L))).map(kvs => WMap(kvs.toMap))))
  }

  /** reference comparator: CIP ranks (Map < List < String < Boolean <
    * Number < null) + reference MapValue.unsafeCompareTo (size, sorted
    * keys, values) + element-wise lists with shorter prefix first. */
  private def wCmp(a: W, b: W): Int = {
    def rank(w: W): Int = w match {
      case _: WMap => 0; case _: WList => 1; case _: WStr => 2
      case _: WBool => 3; case _: WNum => 4; case WNull => 5
    }
    val r = rank(a) - rank(b)
    if (r != 0) r
    else (a, b) match {
      case (WStr(x), WStr(y))   => x.compareTo(y)
      case (WBool(x), WBool(y)) => x.compareTo(y)
      case (WNum(x), WNum(y))   => java.lang.Long.compare(x, y)
      case (WList(xs), WList(ys)) =>
        xs.zip(ys).iterator.map { case (x, y) => wCmp(x, y) }
          .find(_ != 0).getOrElse(xs.size - ys.size)
      case (WMap(x), WMap(y)) =>
        if (x.size != y.size) x.size - y.size
        else {
          val (kx, ky) = (x.keys.toSeq.sorted, y.keys.toSeq.sorted)
          kx.zip(ky).iterator.map { case (p, q) => p.compareTo(q) }
            .find(_ != 0)
            .getOrElse(kx.iterator.map(k => java.lang.Long.compare(x(k), y(k)))
              .find(_ != 0).getOrElse(0))
        }
      case _ => 0
    }
  }

  private def encW(depth: Int, w: W): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    w match {
      case WNum(v)  => Orderability.numberAt(depth, lit(v))
      case WStr(s)  => Orderability.stringAt(depth, lit(s))
      case WBool(b) => Orderability.booleanAt(depth, lit(b))
      case WNull    => Orderability.nullAt(depth)
      case WList(Nil) =>
        Orderability.listOfEncodedAt(depth, Orderability.emptyElems(depth))
      case WList(xs) =>
        Orderability.listOfEncodedAt(depth,
          array(xs.map(encW(depth + 1, _)): _*))
      case WMap(m) =>
        val c =
          if (m.isEmpty) map().cast("map<string,bigint>")
          else map(m.toSeq.flatMap { case (k, v) =>
            Seq(lit(k), lit(v)) }: _*)
        Orderability.encoderAt(depth, MapType(StringType, LongType)).get(c)
    }
  }

  test("nested encoded sort matches the reference comparator (lists, maps)") {
    for (seed <- Seq(5L, 23L, 4242L)) {
      val vs = (0 until 60).flatMap(i =>
        wGen(0).apply(Gen.Parameters.default, Seed(seed + i))).toList
      val df = spark.range(1)
        .select(posexplode(array(vs.map(encW(0, _)): _*)).as(Seq("pos", "v")))
      val sorted = df.orderBy(col("v").asc).select("pos")
        .collect().toSeq.map(r => vs(r.getInt(0)))
      sorted.sliding(2).foreach {
        case Seq(x, y) =>
          assert(wCmp(x, y) <= 0, s"out of order: $x !<= $y (seed $seed)")
        case _ => ()
      }
    }
  }

  test("descending encoded sort reverses the order with nulls first") {
    val vs = sample(120, 7L)
    val desc = sortedByEncoding(vs, asc = false)
    desc.sliding(2).foreach {
      case Seq(a, b) => assert(cmp(a, b) >= 0, s"out of order desc: $a !>= $b")
      case _ => ()
    }
    assert(desc.takeWhile(_ == VNull).size == vs.count(_ == VNull),
      "descending must lead with every null")
  }
}
