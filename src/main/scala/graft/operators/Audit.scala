package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Cross-table corpus integrity audit — the pre-training data-quality
  * gate: referential integrity between the text corpus and its embedding
  * table, plus vector sanity (NaN components, zero vectors, dimension
  * drift) and text sanity (empty documents, missing language tags). The
  * output is a fixed (issue, n) report — all-zero on a healthy corpus —
  * that a pipeline asserts on before a training run consumes the data.
  *
  * Scale shape: each base table is scanned ONCE with conditional
  * aggregates (map-side, column-pruned to exactly the checked columns);
  * the two referential checks are id-projected anti joins (the join
  * carries 8-byte ids, never payloads). Everything reduces to a handful
  * of scalar counts — no corpus-sized intermediate ever materializes.
  */
object Audit {

  /** Expected embedding dimensionality for the corpus. */
  val ExpectedDim = 64

  /** (issue, n) integrity report over a (documents, embeddings) pair. */
  def integrity(docs: DataFrame, emb: DataFrame, expectedDim: Int = ExpectedDim): DataFrame = {
    val docCounts = docs.agg(
      sum(when(trim(col("text")) === "", 1L).otherwise(0L)).as("empty_text"),
      sum(when(col("lang").isNull || col("lang") === "", 1L).otherwise(0L)).as("null_lang"))
      .select(explode(map(
        lit("empty_text"), col("empty_text"),
        lit("null_lang"), col("null_lang"))).as(Seq("issue", "n")))
    val embCounts = emb.agg(
      sum(when(exists(col("embedding"), x => x.isNaN), 1L).otherwise(0L)).as("nan"),
      sum(when(forall(col("embedding"), x => x === lit(0.0)), 1L).otherwise(0L)).as("zero"),
      sum(when(size(col("embedding")) =!= expectedDim, 1L).otherwise(0L)).as("dim"))
      .select(explode(map(
        lit("embedding_nan"), col("nan"),
        lit("embedding_zero_norm"), col("zero"),
        lit("embedding_dim_mismatch"), col("dim"))).as(Seq("issue", "n")))
    val docIds = docs.select(col("doc_id"))
    val vecIds = emb.select(col("vec_id"))
    val missing = docIds
      .join(vecIds, docIds("doc_id") === vecIds("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("doc_missing_embedding").as("issue"), col("n"))
    val orphan = vecIds
      .join(docIds, docIds("doc_id") === vecIds("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("embedding_orphan").as("issue"), col("n"))
    docCounts
      .unionAll(embCounts)
      .unionAll(missing)
      .unionAll(orphan)
      .orderBy("issue")
  }

  /** q72 — [[integrity]] over the driver tables (healthy corpus → the
    * all-zero report; detection of each issue class is spec'd on planted
    * dirty fixtures in `AuditSpec`). */
  def q72IntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    integrity(Tables.documents(spark, dir), Tables.embeddings(spark, dir))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_integrity_audit" -> (q72IntegrityAudit _))

  val oracles: Map[String, String] = Map(
    "q72_integrity_audit" ->
      s"""SELECT issue, n FROM (
         |  SELECT 'empty_text' AS issue,
         |    CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n
         |  FROM documents
         |  UNION ALL
         |  SELECT 'null_lang',
         |    CAST(sum(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 'embedding_nan',
         |    CAST(sum(CASE WHEN len(list_filter(embedding, x -> isnan(x))) > 0
         |                  THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM embeddings
         |  UNION ALL
         |  SELECT 'embedding_zero_norm',
         |    CAST(sum(CASE WHEN len(list_filter(embedding, x -> x <> 0)) = 0
         |                  THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM embeddings
         |  UNION ALL
         |  SELECT 'embedding_dim_mismatch',
         |    CAST(sum(CASE WHEN len(embedding) <> $ExpectedDim THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM embeddings
         |  UNION ALL
         |  SELECT 'doc_missing_embedding', CAST(count(*) AS BIGINT)
         |  FROM documents d
         |  WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
         |  UNION ALL
         |  SELECT 'embedding_orphan', CAST(count(*) AS BIGINT)
         |  FROM embeddings e
         |  WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
         |ORDER BY issue""".stripMargin)
}
