package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Multimodal-column plumbing (SURVEY §2.9): media payloads as opaque
  * `binary` columns with a typed metadata struct, plus a partition-wise
  * decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[FakeDecoder]]); everything
  * Spark-side — schema, batch shape, partition-wise execution, feature
  * column type — is real and tested. Swapping the stub for a JNI/codec
  * call changes no plan shape.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no base64 round
  * trips), decode runs inside `mapPartitions` so per-partition
  * initialization (a real decoder's native context) amortizes across the
  * batch, and the feature output is a fixed-width float array — the
  * layout a vectorized writer packs efficiently.
  */
object Multimodal {

  /** A media asset row: payload + typed metadata (the reference keeps
    * all metadata as flat typed columns after flattening,
    * `data_extractor.py:40-57` — same convention here). */
  case class MediaAsset(
      doc_id: Long,
      payload: Array[Byte],
      format: String,
      width: Long,
      height: Long)

  case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      // STUB output: a real decoder would emit image features here.
      mean_byte: Double,
      feature: Array[Float])

  /** Deterministic fake decode: byte statistics + a fixed-width
    * "embedding". STUB — stands in for image/audio decoding (libs absent
    * in this container); replace `decode` only, the pipeline around it
    * is production-shaped. */
  object FakeDecoder {
    val FeatureDim = 8
    def decode(a: MediaAsset): MediaFeatures = {
      val bytes = a.payload
      val mean = if (bytes.isEmpty) 0.0 else bytes.map(_ & 0xff).map(_.toLong).sum.toDouble / bytes.length
      val feat = Array.tabulate(FeatureDim) { i =>
        var acc = 0L
        var j = i
        while (j < bytes.length) { acc += (bytes(j) & 0xff); j += FeatureDim }
        (acc % 1000).toFloat / 1000f
      }
      MediaFeatures(a.doc_id, a.format, bytes.length.toLong, mean, feat)
    }
  }

  /** Build the media-asset table from `documents`: payload = UTF-8 bytes
    * of the text (deterministic stand-in for real image bytes), format
    * and dimensions derived deterministically so the oracle can recompute
    * them. */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(64) + (col("n_chars") % 64) * lit(16)).cast("long").as("width"),
        (lit(64) + (col("n_chars") % 48) * lit(16)).cast("long").as("height"))
      .as[MediaAsset]
  }

  /** Partition-wise decode: the real-world shape for codec work — one
    * decoder context per partition, streamed batch through it. */
  def decodeAll(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // A real decoder would initialize its native context here, once
      // per partition, then stream the batch through it.
      it.map(FakeDecoder.decode)
    }
  }

  case class ResizedAsset(
      doc_id: Long,
      format: String,
      out_w: Long,
      out_h: Long,
      n_bytes: Long,
      out_bytes: Long,
      mean_sampled: Double)

  case class FrameSample(
      doc_id: Long,
      n_frames: Long,
      n_sampled: Long,
      sampled_bytes: Long,
      sample_fp: Long)

  /** Deterministic stand-ins for codec-side resize and frame sampling.
    * STUB like [[FakeDecoder]]: a real implementation swaps the byte
    * arithmetic for libvips/ffmpeg calls; the integer geometry, the
    * subsampling positions, and the pipeline shape stay identical —
    * which is exactly what the oracle verifies. */
  object FakeCodec {
    /** Fit (width, height) into a `box`×`box` target with one integer
      * scale denominator; the payload stub keeps every den-th byte
      * (area shrink analogue). All-integer math → oracle-exact. */
    def resize(a: MediaAsset, box: Long = 256L): ResizedAsset = {
      val den = math.max(1L, (math.max(a.width, a.height) + box - 1) / box)
      val outW = math.max(1L, a.width / den)
      val outH = math.max(1L, a.height / den)
      val d = den.toInt
      var sum = 0L
      var cnt = 0L
      var i = 0
      while (i < a.payload.length) {
        sum += (a.payload(i) & 0xff); cnt += 1; i += d
      }
      val mean = if (cnt == 0) 0.0 else sum.toDouble / cnt
      ResizedAsset(a.doc_id, a.format, outW, outH, a.payload.length.toLong, cnt, mean)
    }

    /** Split the payload into fixed `frame`-byte frames, keep every
      * `stride`-th frame, and fingerprint the sampled bytes with the
      * rolling (acc·31 + b) mod 1e9+7 fold — the video-frame-sampling
      * shape over an opaque payload. */
    def sampleFrames(a: MediaAsset, frame: Int = 64, stride: Int = 4): FrameSample = {
      val n = a.payload.length
      val nFrames = (n + frame - 1) / frame
      var fp = 0L
      var sampledBytes = 0L
      var nSampled = 0L
      var f = 0
      while (f < nFrames) {
        nSampled += 1
        var i = f * frame
        val end = math.min((f + 1) * frame, n)
        while (i < end) {
          fp = (fp * 31 + (a.payload(i) & 0xff)) % 1000000007L
          sampledBytes += 1
          i += 1
        }
        f += stride
      }
      FrameSample(a.doc_id, nFrames.toLong, nSampled, sampledBytes, fp)
    }
  }

  /** Partition-wise resize stage — same execution shape as [[decodeAll]]. */
  def resizeAll(assets: Dataset[MediaAsset], box: Long = 256L): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(FakeCodec.resize(_, box)))
  }

  /** Partition-wise frame-sampling stage. */
  def sampleFramesAll(assets: Dataset[MediaAsset],
      frame: Int = 64, stride: Int = 4): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(FakeCodec.sampleFrames(_, frame, stride)))
  }

  /** q32 — multimodal metadata projection: the oracle-checkable face of
    * the asset table (payload size + derived metadata). Exercises the
    * binary column end-to-end without depending on the stubbed decode. */
  def q32MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    assets(spark, dir).toDF()
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("format"), col("width"), col("height"))
      .orderBy("doc_id")
  }

  /** q33 — decoded-feature roll-up: runs the partition-wise decode stage
    * and aggregates its deterministic outputs per format. The mean-byte
    * stat is integer-derived (sum of bytes / count) so the oracle can
    * recompute it exactly from the text. */
  def q33DecodeStats(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    decodeAll(assets(spark, dir)).toDF()
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        // per-asset means quantized to exact integer micros before the
        // order-sensitive fp sum — same tie-proofing as q40/q23
        sum(round(col("mean_byte") * 1000000).cast("long")).as("sum_micros"))
      .select(col("format"), col("n_assets"), col("total_bytes"),
        (floor((col("sum_micros") * 2 + col("n_assets") * 100) /
          (col("n_assets") * 200)) / 10000.0).as("avg_mean_byte"))
      .orderBy("format")
  }

  /** q50 — resize stage output: per-asset scaled dimensions + subsampled
    * payload stats. The oracle recomputes the integer geometry and the
    * every-den-th-byte sample from the text bytes (hex-pair recovery),
    * so the whole stage — not just its metadata — is verified. */
  def q50Resize(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    resizeAll(assets(spark, dir)).toDF()
      .select(col("doc_id"), col("format"), col("out_w"), col("out_h"),
        col("n_bytes"), col("out_bytes"), round(col("mean_sampled"), 4).as("mean_sampled"))
      .orderBy("doc_id")
  }

  /** q51 — frame-sampling stage output: frame counts + rolling
    * fingerprint of the sampled bytes (64-byte frames, every 4th kept).
    * The fingerprint makes the check content-exact: any off-by-one in
    * frame boundaries or sample positions changes it. */
  def q51FrameSample(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    sampleFramesAll(assets(spark, dir)).toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal_meta" -> (q32MultimodalMeta _),
    "q33_decode_stats"    -> (q33DecodeStats _),
    "q50_resize"          -> (q50Resize _),
    "q51_frame_sample"    -> (q51FrameSample _))

  val oracles: Map[String, String] = Map(
    "q32_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |  CAST(64 + (n_chars % 64) * 16 AS BIGINT) AS width,
        |  CAST(64 + (n_chars % 48) * 16 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mean_byte is computed over the UTF-8 BYTES of the payload (exactly
    // what FakeDecoder sees), not characters: the blob is hex-encoded and
    // each byte recovered from its hex pair, so non-ASCII text and the
    // empty-payload guard (0.0, matching the Spark side) both hold.
    "q33_decode_stats" ->
      """WITH hx AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |    octet_length(encode(text)) AS n_bytes,
        |    hex(encode(text)) AS h
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, format, n_bytes,
        |    CASE WHEN n_bytes = 0 THEN 0.0 ELSE
        |      CAST(list_sum(list_transform(range(1, n_bytes + 1),
        |        i -> (strpos('0123456789ABCDEF', substr(h, CAST(2*i-1 AS INTEGER), 1)) - 1) * 16
        |           + (strpos('0123456789ABCDEF', substr(h, CAST(2*i AS INTEGER), 1)) - 1))) AS DOUBLE)
        |        / n_bytes END AS mean_byte
        |  FROM hx)
        |SELECT format, count(*) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  floor((2 * sum(CAST(round(mean_byte * 1000000) AS BIGINT)) + 100 * count(*))
        |        / (200.0 * count(*))) / 10000.0 AS avg_mean_byte
        |FROM b GROUP BY format ORDER BY format""".stripMargin,
    // resize verified end-to-end: integer geometry + the every-den-th
    // byte sample recovered from hex pairs — the stage's actual output,
    // not just its metadata
    "q50_resize" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |    64 + (n_chars % 64) * 16 AS width,
        |    64 + (n_chars % 48) * 16 AS height,
        |    octet_length(encode(text)) AS n,
        |    hex(encode(text)) AS hx
        |  FROM documents),
        |d AS (SELECT *, greatest(1, (greatest(width, height) + 255) // 256) AS den FROM a),
        |s AS (
        |  SELECT doc_id, format,
        |    greatest(1, width // den) AS out_w,
        |    greatest(1, height // den) AS out_h,
        |    n,
        |    list_transform(range(0, CAST(n AS BIGINT), den), i ->
        |      CAST((strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1) AS BIGINT)) AS sampled
        |  FROM d)
        |SELECT doc_id, format, CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
        |  CAST(n AS BIGINT) AS n_bytes, CAST(len(sampled) AS BIGINT) AS out_bytes,
        |  round(CASE WHEN len(sampled) = 0 THEN 0.0 ELSE CAST(list_sum(sampled) AS DOUBLE) / len(sampled) END, 4) AS mean_sampled
        |FROM s ORDER BY doc_id""".stripMargin,
    // frame sampling content-verified by the rolling fingerprint of the
    // sampled bytes — any frame-boundary off-by-one changes the value
    "q51_frame_sample" ->
      """WITH a AS (SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx FROM documents),
        |f AS (SELECT doc_id, n, hx, (n + 63) // 64 AS n_frames FROM a),
        |s AS (
        |  SELECT doc_id, n_frames,
        |    flatten(list_transform(range(0, CAST(n_frames AS BIGINT), 4), fr ->
        |      list_transform(range(fr*64, least((fr+1)*64, CAST(n AS BIGINT))), i ->
        |        CAST((strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
        |           + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1) AS BIGINT)))) AS sampled,
        |    len(range(0, CAST(n_frames AS BIGINT), 4)) AS n_sampled
        |  FROM f)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames, CAST(n_sampled AS BIGINT) AS n_sampled,
        |  CAST(len(sampled) AS BIGINT) AS sampled_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), sampled), (acc, b) -> (acc * 31 + b) % 1000000007) AS sample_fp
        |FROM s ORDER BY doc_id""".stripMargin)
}
