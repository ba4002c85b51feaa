package graft

import graft.functions.expressions.{ArgmaxDot, PqAdc, PqEncode, PqLut, VectorSqDist}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused vector-quantization kernels (r16) must be decision-for-
  * decision identical to the HOF spellings they replaced in
  * Similarity.assignCells / pqTopK / bruteForceTopK(EUCLIDEAN). */
class VectorKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def registerAll(): Unit = {
    ArgmaxDot.ensureRegistered(spark)
    PqEncode.ensureRegistered(spark)
    PqLut.ensureRegistered(spark)
    PqAdc.ensureRegistered(spark)
    VectorSqDist.ensureRegistered(spark)
  }

  // the exact HOF argmax the kernels replaced
  private def hofArgmax(v: org.apache.spark.sql.Column,
      cents: org.apache.spark.sql.Column) =
    aggregate(cents,
      struct(lit(Double.MinValue).as("s"), lit(-1).as("cid")),
      (acc, cen) => {
        val s = graft.functions.Similarity.dot(v, cen.getField("_2"))
        when(s > acc.getField("s"),
          struct(s.as("s"), cen.getField("_1").as("cid"))).otherwise(acc)
      }).getField("cid")

  private val rng = new scala.util.Random(11)
  private def randVec(d: Int): Seq[Double] = Seq.fill(d)(rng.nextDouble() * 2 - 1)

  test("argmax_dot matches the HOF aggregate (incl. ties and null dots)") {
    registerAll()
    val cents = (0 until 16).map(c => (c, randVec(8))) ++
      Seq((16, randVec(8).take(4)))  // length mismatch -> null dot, skipped
    val rows = Seq.fill(100)(randVec(8)) ++
      Seq(Seq.fill(8)(0.0))          // all dots 0.0 vs MinValue: first wins
    val df = rows.map(v => (v, cents)).toDF("v", "cents")
    val got = df.select(
      call_function("argmax_dot", col("v"), col("cents")).as("nat"),
      hofArgmax(col("v"), col("cents")).as("hof")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("argmax_dot returns -1 when every dot is null") {
    registerAll()
    val df = Seq((Seq(1.0, 2.0), Seq((0, Seq(1.0))))).toDF("v", "cents")
    assert(df.select(call_function("argmax_dot", col("v"), col("cents")))
      .first().getInt(0) == -1)
  }

  test("pq_encode / pq_lut / pq_adc match the HOF pipeline bit-for-bit") {
    registerAll()
    val m = 4; val sub = 4; val dim = m * sub; val nCents = 8
    val cb = (0 until m).map(j => (j, (0 until nCents).map(c => (c, randVec(sub)))))
    val corpus = Seq.fill(50)(randVec(dim))
    val queries = Seq.fill(7)(randVec(dim))

    val cdf = corpus.map(v => (v, cb)).toDF("v", "cb")
    // HOF encode (the replaced spelling)
    val hofCode = transform(sequence(lit(0), lit(m - 1)), j => {
      val qs = slice(col("v"), j * sub + 1, lit(sub))
      aggregate(element_at(col("cb"), j + 1).getField("_2"),
        struct(lit(Double.MinValue).as("s"), lit(-1).as("cid")),
        (acc, cen) => {
          val s = graft.functions.Similarity.dot(qs, cen.getField("_2"))
          when(s > acc.getField("s"),
            struct(s.as("s"), cen.getField("_1").as("cid"))).otherwise(acc)
        }).getField("cid")
    })
    val codes = cdf.select(
      call_function("pq_encode", col("v"), col("cb"), lit(sub)).as("nat"),
      hofCode.as("hof")).collect()
    codes.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1)) }

    val qdf = queries.map(v => (v, cb)).toDF("qv", "cb")
    val hofLut = transform(col("cb"), je =>
      transform(je.getField("_2"), cen =>
        graft.functions.Similarity.dot(
          slice(col("qv"), je.getField("_1") * sub + 1, lit(sub)),
          cen.getField("_2"))))
    val luts = qdf.select(
      call_function("pq_lut", col("qv"), col("cb"), lit(sub)).as("nat"),
      hofLut.as("hof")).collect()
    luts.foreach { r =>
      val a = r.getSeq[scala.collection.Seq[Double]](0)
      val b = r.getSeq[scala.collection.Seq[Double]](1)
      assert(a.size == b.size)
      a.zip(b).foreach { case (x, y) =>
        x.zip(y).foreach { case (p, q) =>
          assert(java.lang.Double.doubleToRawLongBits(p) ==
            java.lang.Double.doubleToRawLongBits(q)) } }
    }

    // ADC: same fold as aggregate(zip_with(code, lut, element_at), 0.0, +)
    val pair = for (c <- corpus.take(10); q <- queries.take(3)) yield (c, q)
    val pdf = pair.map { case (c, q) => (c, q, cb) }.toDF("v", "qv", "cb")
      .withColumn("code", call_function("pq_encode", col("v"), col("cb"), lit(sub)))
      .withColumn("lut", call_function("pq_lut", col("qv"), col("cb"), lit(sub)))
    val hofAdc = aggregate(zip_with(col("code"), col("lut"),
      (cd, l) => element_at(l, cd + 1)), lit(0.0), (acc, v) => acc + v)
    val sims = pdf.select(
      call_function("pq_adc", col("code"), col("lut")).as("nat"),
      hofAdc.as("hof")).collect()
    sims.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))) }
  }

  test("pq_adc null corners: length mismatch and null entries poison") {
    registerAll()
    val df = Seq(
      (Seq(0, 1), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), false), // 1.0+4.0
      (Seq(0), Seq(Seq(1.0), Seq(2.0)), true),               // len mismatch
    ).toDF("code", "lut", "expectNull")
    val got = df.select(call_function("pq_adc", col("code"), col("lut"))).collect()
    assert(got(0).getDouble(0) == 5.0)
    assert(got(1).isNullAt(0))
  }

  test("vector_sqdist matches the HOF spelling bit-for-bit + null corners") {
    registerAll()
    val rows = Seq.fill(100)((randVec(32), randVec(32)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    df.select(call_function("vector_sqdist", col("a"), col("b")).as("nat"),
        hof.as("hof")).collect()
      .foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1))) }
    val corners = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),        // mismatch -> null
      (None, Some(Seq(1.0))),                       // null operand
      (Some(Seq[Double]()), Some(Seq[Double]()))    // empty -> 0.0
    ).toDF("a", "b")
    val g = corners.select(call_function("vector_sqdist", col("a"), col("b"))).collect()
    assert(g(0).isNullAt(0)); assert(g(1).isNullAt(0))
    assert(g(2).getDouble(0) == 0.0)
  }

  test("interpreted eval path (no codegen) agrees for every kernel") {
    registerAll()
    val cb = Seq((0, Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))),
      (1, Seq((0, Seq(1.0, 1.0)), (1, Seq(-1.0, 1.0)))))
    val df = Seq((Seq(0.2, 0.9, 0.5, -0.5), Seq(0.3, 0.1, 0.5, 0.5), cb))
      .toDF("v", "qv", "cb")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r = df.select(
        call_function("pq_encode", col("v"), col("cb"), lit(2)).as("c"),
        call_function("pq_lut", col("qv"), col("cb"), lit(2)).as("l"),
        call_function("vector_sqdist", col("v"), col("qv")).as("d")).first()
      assert(r.getSeq[Int](0) == Seq(1, 0))
      assert(r.getSeq[scala.collection.Seq[Double]](1).size == 2)
      assert(math.abs(r.getDouble(2) -
        (math.pow(0.2-0.3,2)+math.pow(0.9-0.1,2)+0.0+math.pow(-0.5-0.5,2))) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
