package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.{IvfIndex, Similarity}

/** IVF-PARTITIONED EMBEDDING LAYOUT (SURVEY §2 layout family, beside
  * bucketing q55, z-order q181 and DPP q188): the embedding store
  * physically partitioned by coarse-quantizer list id — Hive
  * `list_id=` directories, each holding one inverted list (with the
  * q43 spill: a vector lands in its [[Similarity.SpillAssign]] nearest
  * lists). An ANN probe then names its [[Similarity.NumProbeLists]]
  * lists as LITERAL partition predicates and the scan prunes to those
  * directories at planning time — the serving posture of a disk-backed
  * IVF index (Faiss on-disk, Milvus/LanceDB segment pruning): at
  * 100 TB the index cannot live in memory, and partition-pruned scans
  * of ~12% of the store per probe batch are what makes cold ANN
  * serving affordable. The in-memory q43 path recomputes the
  * assignment per query; this layout pays it ONCE at write time (the
  * z-order lazy-rewrite lifecycle, keyed by corpus version).
  *
  * q194 gates the layout end-to-end: the layout-served search must
  * return row-identically what the in-memory index returns — same
  * centroids ([[IvfIndex]] version cache), same probe fan-out
  * ([[Similarity.probeListPairs]]) and same scoring tail
  * ([[Similarity.ivfScoreTail]]) by construction, with the parquet
  * float round-trip the only new link — while the scan reads only the
  * probed partitions (`IvfLayoutSpec` asserts the executed plan's
  * partition count and the pruning). The verdict row follows the q43
  * convention: deterministic corpus facts plus literal booleans the
  * oracle asserts.
  */
object IvfLayout {

  private val built = scala.collection.mutable.Map.empty[(String, String), String]

  /** Ensure the IVF-partitioned copy of `dir`'s embeddings; returns
    * the layout root (`list_id=N/` Hive directories). A new corpus
    * version REPLACES the previous one: the superseded layout directory
    * is deleted and its map entry dropped — a long-lived driver over a
    * refreshing corpus would otherwise leak one full store copy per
    * version in the temp dir. */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val version = IvfIndex.corpusVersion(spark, dir)
    built.getOrElse((dir, version), {
      built.keys.filter(_._1 == dir).toSeq.foreach { k =>
        val staleRoot = java.nio.file.Paths.get(built(k)).getParent
        scala.util.Try(graft.exec.Retention.deleteRecursively(staleRoot))
        built.remove(k)
      }
      val out = java.nio.file.Files.createTempDirectory("graft-ivflayout").toString
      val emb = Tables.embeddings(spark, dir)
      val centers = IvfIndex.centroids(spark, dir, Similarity.NumLists)
      emb.select(
          col("vec_id"), col("embedding"),
          explode(graft.functions.VectorFunctions.nearest_centroids(
            col("embedding"), centers, Similarity.SpillAssign)).as("list_id"))
        .write.partitionBy("list_id").parquet(s"$out/store")
      built((dir, version)) = s"$out/store"
      s"$out/store"
    })
  }

  /** The layout-served ANN search: probed lists as literal partition
    * predicates over the partitioned store, then the shared scoring
    * tail. */
  private[graft] def servedTopK(spark: SparkSession, dir: String): DataFrame = {
    val root = ensure(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val centers = IvfIndex.centroids(spark, dir, Similarity.NumLists)
    val probed = Similarity.probeListPairs(spark, emb, centers)
      .map(_._2).distinct.sorted
    val store = spark.read.parquet(root)
      .filter(col("list_id").isin(probed: _*))
      .select(col("vec_id"), col("embedding"),
        col("list_id").cast("int").as("list_id"))
    Similarity.ivfScoreTail(store, Similarity.ivfProbes(spark, emb, centers))
  }

  /** The distinct probed list ids (what the serving scan may read). */
  private[graft] def probedLists(spark: SparkSession, dir: String): Seq[Int] = {
    val emb = Tables.embeddings(spark, dir)
    val centers = IvfIndex.centroids(spark, dir, Similarity.NumLists)
    Similarity.probeListPairs(spark, emb, centers).map(_._2).distinct.sorted
  }

  /** q194 — the layout gate: layout-served results compared
    * row-for-row against the in-memory index IN-PLAN, plus the pruning
    * facts. `pruned` = the probe batch's list union is a strict subset
    * of the store's lists; `scan_bounded` = it never exceeds
    * probes × nprobe. */
  def q194IvfLayoutServe(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    val mem = Similarity.ivfTopK(spark, dir)
    val served = servedTopK(spark, dir)
    val probed = probedLists(spark, dir)
    val joined = mem.select(col("probe_id"), col("neighbor_id"),
        col("cosine"), lit(1L).as("m"))
      .join(
        served.select(col("probe_id"), col("neighbor_id"),
          col("cosine"), lit(1L).as("s")),
        Seq("probe_id", "neighbor_id", "cosine"), "full_outer")
    joined.agg(
      countDistinct(col("probe_id")).as("n_probes"),
      (sum(when(col("m").isNull || col("s").isNull, 1L).otherwise(0L))
        === 0L).as("results_match"),
      lit(probed.size < Similarity.NumLists).as("pruned"),
      lit(probed.size <=
        Similarity.NumProbes * Similarity.NumProbeLists).as("scan_bounded"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_ivf_layout_serve" -> (q194IvfLayoutServe _))

  /** q43 verdict convention: the probe count is a corpus fact, the
    * three verdicts are deterministic engine-side booleans asserted
    * literally (layout equivalence + pruning are builder-verified at
    * every driver SF; the spec additionally asserts the executed scan
    * reads only the probed partitions). */
  val oracles: Map[String, String] = Map(
    "q194_ivf_layout_serve" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_probes,
         |  TRUE AS results_match, TRUE AS pruned, TRUE AS scan_bounded
         |FROM embeddings WHERE vec_id < ${Similarity.NumProbes}""".stripMargin)
}
