package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Multimodal payload columns: image/audio/video as opaque BINARY columns
 * with typed metadata — the pattern a 100 TB training-data pipeline needs
 * (the reference stores only scalar/array properties; binary payloads are
 * the LLM-era extension, kept here as first-class columns so parquet stores
 * them page-compressed and column pruning skips them unless touched).
 *
 * Everything metadata-level is REAL and codegen'd (magic-byte sniffing,
 * PNG/WAV header field extraction via substring/conv on the byte prefix —
 * no UDF, pennies per row at scale). The codec-dependent DECODE step
 * (pixels/samples) is a clearly-marked deterministic STUB — the container
 * ships no image/audio libraries — behind the same partition-batched
 * interface a real decoder would use.
 */
object Multimodal {

  /** Content-addressed identity for exact binary dedup. */
  def contentHash(bin: Column): Column = sha2(bin, 256)

  def byteSize(bin: Column): Column = length(bin).cast("long")

  /** MIME sniffing from magic bytes — the binary analog of a file(1) probe.
    * Pure hex-prefix comparison: whole-stage-codegen friendly. */
  def sniffMime(bin: Column): Column = {
    val hex8 = hex(substring(bin, 1, 8))
    when(hex8.startsWith("89504E47"), "image/png")
      .when(hex8.startsWith("FFD8FF"), "image/jpeg")
      .when(hex8.startsWith("47494638"), "image/gif")
      .when(hex8.startsWith("52494646") &&
        hex(substring(bin, 9, 4)) === "57415645", "audio/wav")
      .when(hex8.startsWith("494433") || hex8.startsWith("FFFB"), "audio/mpeg")
      .when(hex8.startsWith("255044462D"), "application/pdf")
      .otherwise("application/octet-stream")
  }

  /** Big-endian u32 at 1-based byte offset — PNG-style header field. */
  private def beU32(bin: Column, offset: Int): Column =
    conv(hex(substring(bin, offset, 4)), 16, 10).cast("long")

  /** Little-endian u32 at 1-based byte offset — RIFF/WAV-style field
    * (byte-reversed before conv). */
  private def leU32(bin: Column, offset: Int): Column = {
    val bytes = (0 until 4).reverse.map(i => hex(substring(bin, offset + i, 1)))
    conv(concat(bytes: _*), 16, 10).cast("long")
  }

  /** PNG IHDR dimensions (spec: width/height big-endian at bytes 17/21).
    * NULL for non-PNG payloads. */
  def pngWidth(bin: Column): Column =
    when(sniffMime(bin) === "image/png", beU32(bin, 17)).otherwise(lit(null))
  def pngHeight(bin: Column): Column =
    when(sniffMime(bin) === "image/png", beU32(bin, 21)).otherwise(lit(null))

  /** WAV fmt-chunk sample rate (little-endian at byte 25) and channel count
    * (byte 23), assuming the canonical RIFF layout. */
  def wavSampleRate(bin: Column): Column =
    when(sniffMime(bin) === "audio/wav", leU32(bin, 25)).otherwise(lit(null))
  def wavChannels(bin: Column): Column =
    when(sniffMime(bin) === "audio/wav",
      conv(hex(substring(bin, 23, 1)), 16, 10).cast("long")).otherwise(lit(null))

  /**
   * REAL PCM16 sample decode for canonical-layout WAV — uncompressed PCM
   * needs no codec: sample i is the signed little-endian int16 at byte
   * 45 + 2i (1-based; 44-byte canonical header with the data chunk at 37).
   * Pure substring/conv higher-order expressions, codegen'd — the one
   * modality whose decode step is honest compute, not a stub.
   *
   * @return ARRAY<INT> of up to maxSamples signed samples (empty for
   *         non-WAV or truncated payloads)
   */
  def wavSamples(bin: Column, maxSamples: Int): Column = {
    val nAvail = least(lit(maxSamples),
      greatest(((byteSize(bin) - 44L) / lit(2L)), lit(0L)).cast("int"))
    val samples = transform(
      sequence(lit(0), greatest(nAvail, lit(1)) - 1), i => {
        val lo = conv(hex(bin.substr(lit(45) + i * 2, lit(1))), 16, 10).cast("int")
        val hi = conv(hex(bin.substr(lit(46) + i * 2, lit(1))), 16, 10).cast("int")
        val u = hi * 256 + lo
        when(u >= 32768, u - 65536).otherwise(u)
      })
    when(sniffMime(bin) === "audio/wav" && nAvail > 0, samples)
      .otherwise(array().cast("array<int>"))
  }

  /** RMS energy / peak amplitude / zero-crossing count over the first
    * maxSamples PCM16 samples — real audio features from the real decode. */
  def wavRms(bin: Column, maxSamples: Int = 256): Column = {
    val s = wavSamples(bin, maxSamples)
    when(size(s) > 0, sqrt(
      aggregate(s, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
        / size(s))).otherwise(lit(null).cast("double"))
  }

  def wavPeak(bin: Column, maxSamples: Int = 256): Column = {
    val s = wavSamples(bin, maxSamples)
    when(size(s) > 0, array_max(transform(s, x => abs(x)))).otherwise(lit(null))
  }

  def wavZeroCrossings(bin: Column, maxSamples: Int = 256): Column = {
    val s = wavSamples(bin, maxSamples)
    when(size(s) > 1, aggregate(
      zip_with(slice(s, lit(1), greatest(size(s) - 1, lit(0))),
        slice(s, lit(2), greatest(size(s) - 1, lit(0))),
        (a, b) => when(signum(a) =!= signum(b) && signum(a) =!= 0, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)).otherwise(lit(null))
  }

  /**
   * JPEG frame dimensions — a REAL marker-segment walk, not a fixed
   * offset: JFIF streams interleave APPn/DQT/DHT segments of arbitrary
   * length before the SOF frame header, so the parser must chain
   * offsets (next = current + 2 + big-endian length). The walk runs as
   * an `aggregate` fold over a bounded marker budget — state is
   * (offset, height, width), each step either records SOF dimensions
   * (markers C0–C3, C5–C7, C9–CB, CD–CF per ITU T.81) or hops the
   * segment — all substring/conv codegen, no UDF. NULL when no SOF
   * appears within the budget or the payload isn't a JPEG.
   */
  private def jpegDims(bin: Column, maxSegments: Int = 12): Column = {
    def byteAt(off: Column): Column =
      conv(hex(bin.substr(off, lit(1))), 16, 10).cast("long")
    def beU16At(off: Column): Column =
      conv(hex(bin.substr(off, lit(2))), 16, 10).cast("long")
    val isJpeg = hex(substring(bin, 1, 2)) === "FFD8"
    val zero = struct(lit(3L).as("off"), lit(null).cast("long").as("h"),
      lit(null).cast("long").as("w"))
    val walked = aggregate(sequence(lit(1), lit(maxSegments)), zero, (acc, _) => {
      val off = acc.getField("off")
      val m1 = byteAt(off)
      val m2 = byteAt(off + 1)
      val sof = m1 === 0xFF && ((m2 >= 0xC0 && m2 <= 0xCF) &&
        m2 =!= 0xC4 && m2 =!= 0xC8 && m2 =!= 0xCC)
      val segLen = beU16At(off + 2)
      when(acc.getField("h").isNotNull || m1 =!= 0xFF || m2 === 0xD9, acc)
        .when(sof, struct(off.as("off"),
          beU16At(off + 5).as("h"), beU16At(off + 7).as("w")))
        .otherwise(struct((off + 2 + segLen).as("off"),
          acc.getField("h"), acc.getField("w")))
    })
    when(isJpeg, walked).otherwise(lit(null).cast(
      "struct<off: bigint, h: bigint, w: bigint>"))
  }

  def jpegHeight(bin: Column): Column = jpegDims(bin).getField("h")
  def jpegWidth(bin: Column): Column = jpegDims(bin).getField("w")

  /** Typed metadata struct: attach once, prune everywhere. */
  def describe(bin: Column): Column = struct(
    sniffMime(bin).as("mime"),
    byteSize(bin).as("bytes"),
    contentHash(bin).as("hash"),
    pngWidth(bin).as("width"),
    pngHeight(bin).as("height"),
    wavSampleRate(bin).as("sample_rate"))

  /** Exact duplicate groups over a binary payload column — one hash shuffle,
    * identical shape to Dedup.exact but content-addressed on bytes. */
  def dedupExact(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol).as("id"), contentHash(col(binCol)).as("h"),
        byteSize(col(binCol)).as("bytes"))
      .groupBy("h")
      .agg(min("id").as("representative"), count(lit(1)).as("dupCount"),
        max("bytes").as("bytes"))

  // -------------------------------------------------------------------
  // Decode plumbing (STUB): the partition-batched feature-extraction path.
  // A real deployment swaps `decodeStub` for a JNI/py decoder; the Spark
  // side — schema, batching, partition locality — is exactly this.
  // -------------------------------------------------------------------

  /**
   * Deterministic FAKE feature vector derived from the content hash —
   * STUB for image/audio embedding (no codec libs in this environment).
   * Stable across runs/executors; unit-scaled; dim components from
   * xxhash64(payload, i).
   */
  def stubFeatures(bin: Column, dim: Int): Column = {
    val comps = (0 until dim).map(i =>
      (pmod(xxhash64(bin, lit(i)), lit(1000003L)).cast("double") / 1000003.0))
    array(comps: _*)
  }

  /**
   * Partition-batched decode: groups rows into `batchSize` chunks per
   * partition (the mapInPandas batch shape) and applies `decode` to each
   * batch. Default decoder = metadata-only stub. Returns (id, mime, bytes,
   * feature ARRAY<DOUBLE>).
   */
  def decodeBatches(df: DataFrame, idCol: String, binCol: String,
      dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val withMeta = df.select(col(idCol).as("id"), sniffMime(col(binCol)).as("mime"),
      byteSize(col(binCol)).as("bytes"), stubFeatures(col(binCol), dim).as("feature"))
    // the batching hook: partition-local, no shuffle; a real decoder would
    // amortize codec init across each `grouped(batchSize)` chunk here
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(withMeta.schema)
    withMeta.mapPartitions { (it: Iterator[Row]) =>
      it.grouped(batchSize).flatMap(identity)
    }.toDF()
  }
}
