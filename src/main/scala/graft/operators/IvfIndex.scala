package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** IVF coarse-quantizer index: the BUILD half of the IVF ANN operator,
  * deliberately outside the query path (an index is built once per corpus
  * version; queries only assign + scan — running a k-means fit inside
  * every query charges the index build to every search).
  *
  * Training follows the standard IVF recipe (faiss-style): fit on a
  * bounded sample, not the corpus — quantizer quality saturates at a few
  * hundred points per centroid, so the sample is capped and the fit is
  * driver-local Lloyd iterations over ≤ [[SampleSize]] vectors (a few MB;
  * never data-sized). The sample is deterministic: top-[[SampleSize]] by
  * `xxhash64(vec_id)`, a seedless pseudo-random order that is stable
  * across runs, partitionings, and cluster sizes, and is computed as a
  * distributed top-k (heap per partition, no full sort, no shuffle of the
  * corpus).
  *
  * Centroids are cached per (corpus, nlist) in a JVM-wide map, and —
  * under the shared derived-stage persistence switch — written to
  * storage next to the corpus keyed by its version signature, so later
  * sessions load the trained quantizer instead of refitting (see
  * [[centroids]]).
  */
object IvfIndex {

  /** Max training vectors: 256 per centroid at the default nlist=16. */
  val SampleSize = 4096
  val LloydIters = 10

  /** Keyed by (dir, nlist); the value carries the corpus-version signature
    * it was built against, so a version change REPLACES the entry instead
    * of stranding the old centroid array forever (one live index per
    * corpus, however many times the corpus is rewritten). */
  private val cache = new ConcurrentHashMap[(String, Int), (String, Array[Array[Double]])]()

  /** The centroid table for (corpus dir, nlist): built on first use,
    * cached thereafter. The cached value folds in a corpus-version
    * signature (max file mtime + file count under the embeddings table)
    * so a rewritten corpus at the same path invalidates the quantizer
    * instead of silently degrading recall in a long-lived session.
    *
    * With `spark.graft.signatures.persist=true` (the one derived-stage
    * persistence switch, shared with [[SignatureStage]]) the trained
    * quantizer is ALSO written next to the corpus, keyed by the same
    * version signature — so a FRESH session (or another cluster) loads
    * the index instead of re-running the sample + Lloyd fit, the way a
    * faiss deployment ships its trained quantizer with the shard. Stale
    * version files for this corpus are evicted on persist; IO failures
    * degrade to cache-only. */
  def centroids(spark: SparkSession, dir: String, k: Int): Array[Array[Double]] = {
    val version = corpusVersion(spark, dir)
    cache.compute((dir, k), (_, prev) =>
      if (prev != null && prev._1 == version) prev
      else (version, loadPersisted(spark, dir, version, k).getOrElse {
        val c = build(spark, dir, k)
        persistCentroids(spark, dir, version, k, c)
        c
      }))._2
  }

  private def persistEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.signatures.persist").exists(_.trim.toBoolean)

  /** Mirror of SignatureStage's root rules: inside the corpus dir by
    * default; a shared override root is namespaced per corpus before any
    * eviction runs. */
  private def ivfRoot(spark: SparkSession, dir: String): HPath =
    spark.conf.getOption("spark.graft.signatures.dir")
      .map(r => new HPath(r, s"corpus_${graft.core.TableVersion.md5Hex(dir)}/ivf"))
      .getOrElse(new HPath(dir, "_graft/ivf"))

  /** Centroid file format: one line per centroid, comma-separated
    * `Double.toString` components (round-trips exactly via parseDouble). */
  private def loadPersisted(
      spark: SparkSession, dir: String, version: String, k: Int): Option[Array[Array[Double]]] = {
    if (!persistEnabled(spark)) return None
    scala.util.Try {
      val p = new HPath(ivfRoot(spark, dir), s"$version/centroids_$k.txt")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        val rows = text.split("\n").filter(_.nonEmpty)
          .map(_.split(",").map(java.lang.Double.parseDouble))
        if (rows.nonEmpty) Some(rows) else None
      }
    }.toOption.flatten
  }

  private def persistCentroids(
      spark: SparkSession, dir: String, version: String, k: Int,
      cs: Array[Array[Double]]): Unit = {
    if (!persistEnabled(spark)) return
    scala.util.Try {
      val root = ivfRoot(spark, dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new HPath(root, s"$version/centroids_$k.txt")
      val out = fs.create(p, true)
      try out.write(cs.map(_.mkString(",")).mkString("\n").getBytes("UTF-8"))
      finally out.close()
      // evict stale versions of THIS corpus' index (root is corpus-scoped)
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName != version)
        .foreach(st => fs.delete(st.getPath, true))
    }
    ()
  }

  /** Cheap corpus signature over the embeddings table files — see
    * [[graft.core.TableVersion]] (Hadoop FS listing, scheme-agnostic). */
  private[graft] def corpusVersion(spark: SparkSession, dir: String): String =
    graft.core.TableVersion.signature(spark, dir, "embeddings.parquet")

  /** Drop cached indexes (tests / corpus refresh). */
  def invalidate(): Unit = cache.clear()

  private def build(spark: SparkSession, dir: String, k: Int): Array[Array[Double]] =
    centroidsOf(Tables.embeddings(spark, dir), k)

  /** Centroids for ANY (vec_id, embedding) frame — the uncached entry the
    * SQL table-function surface uses (no corpus dir to version-key on).
    * The training sample is capped at [[SampleSize]], so the collect is
    * bounded at any corpus scale. */
  def centroidsOf(emb: org.apache.spark.sql.DataFrame, k: Int): Array[Array[Double]] = {
    val sample = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(SampleSize)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    lloyd(sample, k)
  }

  /** Deterministic k-means: k-means++-style farthest-point seeding from a
    * fixed start, then [[LloydIters]] Lloyd rounds. Pure JVM arithmetic
    * over the sample — O(sample × k × dim × iters), microseconds-to-
    * milliseconds at any corpus scale because the sample is capped. */
  private[operators] def lloyd(points: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot build an IVF index over an empty corpus")
    val dim = points.head.length
    val kk = math.min(k, points.length)

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // farthest-point init (deterministic k-means++ variant): start from
    // point 0, repeatedly take the point farthest from its nearest chosen
    // centroid — spreads seeds without randomness
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(0).clone()
    val nearest = points.map(p => d2(p, centers(0)))
    var c = 1
    while (c < kk) {
      var far = 0
      var i = 1
      while (i < points.length) { if (nearest(i) > nearest(far)) far = i; i += 1 }
      centers(c) = points(far).clone()
      i = 0
      while (i < points.length) {
        val d = d2(points(i), centers(c))
        if (d < nearest(i)) nearest(i) = d
        i += 1
      }
      c += 1
    }

    val assign = new Array[Int](points.length)
    var iter = 0
    while (iter < LloydIters) {
      var i = 0
      while (i < points.length) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          val d = d2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < points.length) {
        val a = assign(i)
        counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += points(i)(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < kk) {
        // empty cluster → keep its previous center (deterministic, rare
        // with farthest-point seeding)
        if (counts(j) > 0) {
          var t = 0
          while (t < dim) { sums(j)(t) /= counts(j); t += 1 }
          centers(j) = sums(j)
        }
        j += 1
      }
      iter += 1
    }
    centers
  }
}
