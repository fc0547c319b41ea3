package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.{Sampling, TextOps}

/** STREAMING DSIR admission: the q129 importance scorer run at ingest —
  * the deployment shape where the class models are TRAINED IN BATCH over
  * the historical corpus, then SHIPPED to the stream as a broadcast
  * literal, and every arriving document is scored and admitted map-only,
  * with no state and no shuffle (model-serving inside the stream, the
  * complement of q79's stream-static join enrichment).
  *
  * The model is the (bucket → delta_micro) table from
  * [[Sampling.dsirModel]] — B-sized by construction (B = 64 hashed
  * buckets, vocabulary-independent), so the driver-side collect that
  * ships it is bounded at any corpus scale, exactly like the k×dim
  * centroid state of q130. Features are computed per-row from the
  * document's own token array (unigrams + adjacent bigrams via
  * `zip_with` over shifted slices — array arithmetic, no window), which
  * provably equals the batch path's lead-window bigrams: adjacency is a
  * per-document property. Admission keeps target-like documents
  * (dsir_micro > 0).
  *
  * Everything after the model constant is integer arithmetic, so the
  * drained stream is directly DuckDB-hash-checkable — the oracle replays
  * model training AND per-doc scoring from SQL (no verdict gate
  * needed). */
object DsirStream {

  /** Unigram + adjacent-bigram feature array from a token array. */
  private def featureArray(toks: Column): Column =
    concat(toks,
      when(size(toks) >= 2,
        zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat_ws(" ", a, b)))
        .otherwise(array().cast("array<string>")))

  /** q132 — streamed admission over `dir`'s documents table: score every
    * arriving doc against the batch-trained model, keep target-like
    * ones. AvailableNow drain (the shared graft streaming pattern). */
  def q132StreamDsir(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    // batch-train, then ship: B rows collected once per CORPUS VERSION
    // (ModelCache), never per query run or microbatch — the production
    // model lifetime, where training is an offline job and the stream
    // only ever sees the shipped artifact
    val model: Map[Long, Long] =
      graft.core.ModelCache.perVersion(spark, dir, "documents.parquet", "dsirModel") {
        Sampling.dsirModel(spark, dir)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    val modelLit = typedLit(model)
    val stream = spark.readStream
      .schema(DedupStream.docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val feats = featureArray(TextOps.tokens(col("text")))
    val scored = graft.core.Tables.fanout(spark, stream).select(
      col("doc_id"), col("source"),
      size(feats).cast("long").as("n_feats"),
      aggregate(
        transform(feats, f => coalesce(
          element_at(modelLit, Sampling.dsirBucket(f)), lit(0L))),
        lit(0L), (acc, x) => acc + x).as("dsir_micro"))
      .filter(col("dsir_micro") > 0)
    EventStream.drainToFiles(spark, scored).orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_stream_dsir" -> (q132StreamDsir _))

  /** Model training + per-doc scoring replayed in SQL; the admission
    * floor keeps strictly-positive weights. */
  val oracles: Map[String, String] = Map(
    "q132_stream_dsir" -> {
      val tgtList = Sampling.DsirTargetSources.map(s => s"'$s'").mkString(", ")
      val b = Sampling.DsirBuckets
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS w
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, unnest(w) AS feat FROM d
         |  UNION ALL
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |    i -> w[i] || ' ' || w[i + 1])) AS feat FROM d),
         |b AS (
         |  SELECT doc_id, md5(feat) AS h FROM f),
         |pd AS (
         |  SELECT doc_id, CAST(${Sampling.hex4Sql("h", 1)} % $b AS BIGINT) AS bucket,
         |    count(*) AS c
         |  FROM b GROUP BY 1, 2),
         |pds AS (
         |  SELECT pd.doc_id, pd.bucket, pd.c, ds.source,
         |    ds.source IN ($tgtList) AS tgt
         |  FROM pd JOIN (SELECT doc_id, source FROM documents) ds USING (doc_id)),
         |m AS (
         |  SELECT bucket,
         |    coalesce(sum(c) FILTER (tgt), 0) AS ct,
         |    coalesce(sum(c) FILTER (NOT tgt), 0) AS cr
         |  FROM pds GROUP BY bucket),
         |t AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM m),
         |s AS (
         |  SELECT bucket,
         |    CAST(round(log2((ct + 1) * 1.0 / (nt + $b)) * 1000000) AS BIGINT)
         |  - CAST(round(log2((cr + 1) * 1.0 / (nr + $b)) * 1000000) AS BIGINT)
         |      AS delta_micro
         |  FROM m, t)
         |SELECT doc_id, any_value(source) AS source,
         |  CAST(sum(c) AS BIGINT) AS n_feats,
         |  CAST(sum(c * delta_micro) AS BIGINT) AS dsir_micro
         |FROM pds JOIN s USING (bucket)
         |GROUP BY doc_id
         |HAVING sum(c * delta_micro) > 0
         |ORDER BY doc_id""".stripMargin
    })
}
