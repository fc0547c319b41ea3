package graft.operators

import org.apache.spark.sql.SparkSession

import graft.core.Tables

/** Named warmers for every SHARED per-corpus artifact (round-11
  * verdict item 2): the [[SignatureStage]] tables, the trained IVF
  * quantizers and the media asset stages are built once per (corpus,
  * version) and reused across the whole query surface — so in a timed
  * sweep, whichever query touches one FIRST at a given SF silently
  * pays the whole build, and its number stops measuring the operator
  * (r11: q168's 6.5 s carried the shingle+MinHash+verify build because
  * it sorted before the dedup family).
  *
  * `graft.Bench` times each warmer at the bench SF BEFORE the timed
  * sweep and emits it as its own `cache_<name>` row — the build cost
  * becomes an attributed, recorded fact and every query row measures
  * steady state. The list is ordered so later builds reuse earlier
  * ones (verified_pairs consumes shingle_sigs, etc.). */
object SharedStages {

  val builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "token_stage" -> ((s, d) => { TextOps.tokenStage(s, d).count(); () }),
    "shingle_sigs" -> ((s, d) => { Dedup.shingleSigs(s, d).count(); () }),
    "shingle_hashes" -> ((s, d) => { Dedup.shingleHashes(s, d).count(); () }),
    "minhash_candidates" -> ((s, d) => { Dedup.candidatePairs(s, d).count(); () }),
    "verified_pairs" -> ((s, d) => { Dedup.verifiedPairs(s, d).count(); () }),
    // both trained quantizers: the fixed serving fan-out and the
    // corpus-scaled clustering k
    "ivf_centroids_serving" -> ((s, d) => {
      IvfIndex.centroids(s, d, Similarity.NumLists); () }),
    "ivf_centroids_sem" -> ((s, d) => {
      val n = Tables.embeddings(s, d).count()
      IvfIndex.centroids(s, d, Similarity.semClustersFor(n)); () }),
    // the margin miner's materialized per-version assignment store
    "margin_assign_store" -> ((s, d) => { Margin.assignStore(s, d); () }),
    // the landed training-set export (q248 re-reads it; the one-time
    // ledger pass + partitioned write must not be billed to the query)
    "export_landing" -> ((s, d) => { Export.landExport(s, d); () }),
    // the trained BPE merge table + vocabulary segmentation (q250/q252
    // serve the per-version artifact; training is a one-time build)
    "bpe_merges" -> ((s, d) => {
      val (m, seg) = TextOps.bpeTrainedStages(s, d)
      m.count(); seg.count(); () }),
    // the encoded media asset tables (the heaviest one-time builds)
    "image_assets" -> ((s, d) => { Multimodal.imageAssets(s, d).count(); () }),
    "audio_assets" -> ((s, d) => { Audio.audioAssets(s, d).count(); () }),
    "video_assets" -> ((s, d) => { Multimodal.videoAssets(s, d).count(); () }))
}
