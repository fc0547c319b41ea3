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
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"))
      .orderBy("format")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal_meta" -> (q32MultimodalMeta _),
    "q33_decode_stats"    -> (q33DecodeStats _))

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
        |  round(avg(mean_byte), 4) AS avg_mean_byte
        |FROM b GROUP BY format ORDER BY format""".stripMargin)
}
