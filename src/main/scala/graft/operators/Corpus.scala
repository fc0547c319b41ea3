package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Incremental corpus management: content-level DIFF between two corpus
  * versions — the change-detection step of an incremental training-data
  * pipeline (recrawl lands → which documents are new / changed / gone →
  * downstream stages (dedup signatures, embeddings, packing) recompute
  * only the changed slice instead of the corpus).
  */
object Corpus {

  /** Content diff of two (doc_id, text) corpus versions: one row per
    * doc_id that differs — `added` (only in v2), `removed` (only in v1),
    * `changed` (both, different content fingerprint). Unchanged docs are
    * NOT emitted: the output is change-sized, not corpus-sized — the
    * property that makes incremental recompute cheaper than a rebuild.
    *
    * Scale shape: each side reduces to (doc_id, md5) map-side, then one
    * full outer join on doc_id — the natural co-partitioned key (both
    * versions of a corpus bucket identically on doc_id, so with a
    * bucketed layout this join is Exchange-free; see
    * [[graft.layout.BucketedLayout]]). No collects, no windows. */
  def diff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(trim(col("text"))).as("fp1"))
    val b = v2.select(col("doc_id"), md5(trim(col("text"))).as("fp2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Fixture version rules for [[q66CorpusDiff]]: v1 drops doc_id ≡ 13
    * (mod 97) and uppercases doc_id ≡ 0 (mod 17) (the "old crawl" with a
    * few docs since edited); v2 is the current corpus minus doc_id ≡ 7
    * (mod 89). Both derived deterministically from the one documents
    * table so the oracle reconstructs them exactly. */
  val RemovedInV2Mod = 97L
  val RemovedInV2Rem = 13L
  val ChangedMod = 17L
  val DroppedFromV1Mod = 89L
  val DroppedFromV1Rem = 7L

  /** q66 — [[diff]] over the two fixture versions, ordered for the gate. */
  def q66CorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    val docs = Tables.documents(spark, dir)
    val v1 = docs
      .filter(col("doc_id") % RemovedInV2Mod =!= RemovedInV2Rem)
      .select(col("doc_id"),
        when(col("doc_id") % ChangedMod === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
    val v2 = docs.filter(col("doc_id") % DroppedFromV1Mod =!= DroppedFromV1Rem)
    diff(v1, v2).orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_corpus_diff" -> (q66CorpusDiff _))

  val oracles: Map[String, String] = Map(
    "q66_corpus_diff" ->
      s"""WITH v1 AS (
         |  SELECT doc_id,
         |    md5(trim(CASE WHEN doc_id % $ChangedMod = 0 THEN upper(text)
         |                  ELSE text END)) AS fp1
         |  FROM documents WHERE doc_id % $RemovedInV2Mod <> $RemovedInV2Rem),
         |v2 AS (
         |  SELECT doc_id, md5(trim(text)) AS fp2
         |  FROM documents WHERE doc_id % $DroppedFromV1Mod <> $DroppedFromV1Rem),
         |d AS (
         |  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         |    CASE WHEN v1.doc_id IS NULL THEN 'added'
         |         WHEN v2.doc_id IS NULL THEN 'removed'
         |         WHEN fp1 <> fp2 THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
         |SELECT doc_id, status FROM d
         |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin)
}
