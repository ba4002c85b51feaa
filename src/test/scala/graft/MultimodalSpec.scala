package graft

import graft.functions.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing on synthesized payloads with real
  * format headers (PNG IHDR, RIFF/WAV fmt, JPEG SOI). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Minimal PNG prefix: signature + IHDR length/type + width/height. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdrLen = Array(0, 0, 0, 13).map(_.toByte)
    val ihdr = "IHDR".getBytes("ASCII")
    def be(x: Int) = Array((x >> 24).toByte, (x >> 16).toByte, (x >> 8).toByte, x.toByte)
    sig ++ ihdrLen ++ ihdr ++ be(w) ++ be(h) ++ Array[Byte](8, 6, 0, 0, 0)
  }

  /** Canonical WAV header prefix through the fmt chunk. */
  private def wavBytes(sampleRate: Int, channels: Short): Array[Byte] = {
    def le32(x: Int) = Array(x.toByte, (x >> 8).toByte, (x >> 16).toByte, (x >> 24).toByte)
    def le16(x: Int) = Array(x.toByte, (x >> 8).toByte)
    "RIFF".getBytes("ASCII") ++ le32(36) ++ "WAVE".getBytes("ASCII") ++
      "fmt ".getBytes("ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16)
  }

  private def payloads = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val rows = Seq(
      Row(1L, pngBytes(640, 480)),
      Row(2L, pngBytes(640, 480)),                       // exact dup of 1
      Row(3L, pngBytes(1920, 1080)),
      Row(4L, wavBytes(44100, 2)),
      Row(5L, Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++ "jpegdata".getBytes),
      Row(6L, "plain text bytes".getBytes))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("MIME sniffing from magic bytes") {
    val m = payloads.select(col("id"), Multimodal.sniffMime(col("payload")).as("mime"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "image/png", 2L -> "image/png", 3L -> "image/png",
      4L -> "audio/wav", 5L -> "image/jpeg", 6L -> "application/octet-stream"))
  }

  test("PNG dimensions parsed from IHDR (big-endian)") {
    val d = payloads.filter(col("id") === 3)
      .select(Multimodal.pngWidth(col("payload")), Multimodal.pngHeight(col("payload")))
      .collect()(0)
    assert(d.getLong(0) == 1920L && d.getLong(1) == 1080L)
    // non-PNG → NULL, not garbage
    val n = payloads.filter(col("id") === 4)
      .select(Multimodal.pngWidth(col("payload"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("WAV sample rate and channels (little-endian)") {
    val r = payloads.filter(col("id") === 4)
      .select(Multimodal.wavSampleRate(col("payload")), Multimodal.wavChannels(col("payload")))
      .collect()(0)
    assert(r.getLong(0) == 44100L && r.getLong(1) == 2L)
  }

  test("content-hash dedup groups identical payloads") {
    val groups = Multimodal.dedupExact(payloads, "id", "payload").collect()
    assert(groups.length == 5)
    val dup = groups.find(_.getAs[Long]("dupCount") == 2).get
    assert(dup.getAs[Long]("representative") == 1L)
  }

  test("describe() builds the typed metadata struct") {
    val row = payloads.filter(col("id") === 1)
      .select(Multimodal.describe(col("payload")).as("m"))
      .select("m.mime", "m.width", "m.height", "m.bytes").collect()(0)
    assert(row.getString(0) == "image/png" && row.getLong(1) == 640L &&
      row.getLong(2) == 480L && row.getLong(3) > 0)
  }

  test("WAV PCM16 decode is REAL: samples, RMS, peak, zero crossings") {
    import spark.implicits._
    def le16(x: Int) = Array(x.toByte, (x >> 8).toByte)
    // canonical 44-byte header (data chunk declared) + 4 known samples
    val pcm: Array[Int] = Array(1000, -1000, 32767, -32768)
    val full = wavBytes(8000, 1) ++
      "data".getBytes("ASCII") ++
      Array((pcm.length * 2).toByte, 0.toByte, 0.toByte, 0.toByte) ++
      pcm.flatMap(le16)
    val df = Seq((1L, full)).toDF("id", "payload")
    val s = df.select(Multimodal.wavSamples(col("payload"), 16)).collect()(0)
      .getSeq[Int](0)
    assert(s == Seq(1000, -1000, 32767, -32768))
    val rms = df.select(Multimodal.wavRms(col("payload"))).collect()(0).getDouble(0)
    val expected = math.sqrt(pcm.map(x => x.toDouble * x).sum / 4)
    assert(math.abs(rms - expected) < 1e-9)
    assert(df.select(Multimodal.wavPeak(col("payload"))).collect()(0).getInt(0) == 32768)
    assert(df.select(Multimodal.wavZeroCrossings(col("payload")))
      .collect()(0).getInt(0) == 3) // +,-,+,- alternates three times
    // non-WAV payloads yield empty samples / NULL features
    val png = Seq((2L, pngBytes(4, 4))).toDF("id", "payload")
    assert(png.select(Multimodal.wavSamples(col("payload"), 16))
      .collect()(0).getSeq[Int](0).isEmpty)
    assert(png.select(Multimodal.wavRms(col("payload"))).collect()(0).isNullAt(0))
  }

  test("decodeBatches: stub features are deterministic and batch plumbing preserves rows") {
    val out1 = Multimodal.decodeBatches(payloads, "id", "payload", dim = 4, batchSize = 2)
    val out2 = Multimodal.decodeBatches(payloads, "id", "payload", dim = 4, batchSize = 3)
    assert(out1.count() == 6 && out2.count() == 6)
    val f1 = out1.filter(col("id") === 1).select("feature").collect()(0).getSeq[Double](0)
    val f2 = out2.filter(col("id") === 1).select("feature").collect()(0).getSeq[Double](0)
    assert(f1 == f2 && f1.length == 4 && f1.forall(v => v >= 0.0 && v <= 1.0))
    // identical payloads → identical features (content-derived, not id-derived)
    val g1 = out1.filter(col("id") === 2).select("feature").collect()(0).getSeq[Double](0)
    assert(g1 == f1)
  }

  test("jpegDims walks variable-length segments to the SOF header") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // SOI + APP0(16) + DQT(5) + SOF0: height 0x0140=320, width 0x01E0=480
    val good = hx("FFD8" + "FFE000104A46494600010100000100010000" +
      "FFDB0005AABBCC" + "FFC0000B08" + "0140" + "01E0" + "01011100")
    // progressive SOF2 (C2) with different segment layout before it
    val prog = hx("FFD8" + "FFDB0005AABBCC" + "FFDB0004BBCC" +
      "FFC2000B08" + "0010" + "0020" + "01011100")
    // DHT-only stream: no SOF within budget → nulls
    val noSof = hx("FFD8" + "FFC400051F2F3F" + "FFD9")
    val png = hx("89504E470D0A1A0A")
    val df = Seq((1L, good), (2L, prog), (3L, noSof), (4L, png))
      .toDF("id", "bin")
      .select(col("id"),
        graft.functions.Multimodal.jpegHeight(col("bin")).as("h"),
        graft.functions.Multimodal.jpegWidth(col("bin")).as("w"))
    val r = df.collect().map(x => x.getLong(0) ->
      (Option(x.get(1)), Option(x.get(2)))).toMap
    assert(r(1L) == (Some(320L), Some(480L)), s"got ${r(1L)}")
    assert(r(2L) == (Some(16L), Some(32L)), s"got ${r(2L)}")
    assert(r(3L) == (None, None))
    assert(r(4L) == (None, None))
  }
}
