package graft.operators

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  test("q130 trajectory: members partition the corpus each round; inertia falls; deterministic") {
    val rows = KMeans.q130KmeansRefine(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.core.Tables.embeddings(spark, sf).count()
    val byIter = rows.groupBy(_._1)
    assert(byIter.keySet == (1 to KMeans.Iters).toSet)
    byIter.foreach { case (it, rs) =>
      assert(rs.map(_._3).sum == n, s"iter $it must assign every vector")
      assert(rs.map(_._2).distinct.length == rs.length, s"iter $it cluster grain")
    }
    // Lloyd monotonicity: total inertia never rises across the
    // trajectory (floor-rounded centroids give a micro slack per round;
    // the fixture margins dwarf it, so assert the exact property)
    val totals = (1 to KMeans.Iters).map(it => byIter(it).map(_._4).sum)
    totals.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"inertia rose: $totals") }
    val again = KMeans.q130KmeansRefine(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("refine separates well-separated blobs regardless of seed quality") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // blob A near origin (ids 0-9), blob B offset by 100 units in every
    // dim (ids 10-19); seeds = ids 0 and 1 — BOTH inside blob A, so
    // separation must come from the update step, not the init
    val dim = 4
    val pts = (0L until 20L).map { id =>
      val base = if (id < 10) 0L else 100000000L // 100 units in micros
      (id, Array.tabulate(dim)(i => base + id * 1000L + i))
    }
    val q = pts.toDF("vec_id", "em")
    val out = KMeans.refine(q, k = 2, iters = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val last = out.filter(_._1 == 3)
    // after refinement the two clusters hold exactly the two blobs
    assert(last.map(_._3).sorted.toSeq == Seq(10L, 10L), s"got $last")
    // and the final round's inertia is far below the first round's
    // (round 1 assigns against the two blob-A seeds — blob B is ~100
    // units from both, so its whole mass lands in one seed's bucket)
    val first = out.filter(_._1 == 1)
    assert(last.map(_._4).sum < first.map(_._4).sum / 10)
  }

  test("q177: silhouette replays driver-side from the trained model") {
    val cents = KMeans.trainedCentroids(spark, sf)
    val vecs = KMeans.quantized(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    def d2(v: Array[Long], c: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
      s
    }
    // per vector: distances to all centroids sorted by (d, j)
    val per = vecs.map { case (_, v) =>
      val ds = cents.map { case (j, c) => (d2(v, c), j) }.sorted
      val (a, cluster) = ds(0)
      val (b, _) = ds(1)
      (cluster.toLong, (b - a) * 1000000L / math.max(b, 1L))
    }
    val expected = per.groupBy(_._1).map { case (cl, xs) =>
      val ss = xs.map(_._2)
      cl -> (xs.length.toLong, ss.sum / ss.length, ss.min)
    }
    val got = KMeans.q177Silhouette(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, "silhouette replay")
    // structural facts: clusters partition the corpus, s in [0, 1e6)
    assert(got.values.map(_._1).sum == vecs.length.toLong)
    got.values.foreach { case (_, mean, mn) =>
      assert(mn >= 0L && mean >= mn && mean < 1000000L)
    }
  }

  test("q237: per-cluster prune keeps exactly the hardest PruneCap members (driver replay)") {
    val rows = KMeans.q237ClusterPrune(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong == n, "one row per vector")
    rows.groupBy(_._2).foreach { case (c, rs) =>
      // ranks are a contiguous 1..|cluster| permutation
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length.toLong).toSeq, s"cluster $c ranks")
      // kept = rank within budget, i.e. exactly min(cap, size) members
      assert(rs.count(_._5).toLong == math.min(KMeans.PruneCap, rs.length.toLong), s"cluster $c kept")
      // replay: sort by (d DESC, vec_id ASC) and compare rank-for-rank
      val replay = rs.sortBy(r => (-r._3, r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1L) }.toMap
      rs.foreach(r => assert(r._4 == replay(r._1), s"vec ${r._1} rank"))
    }
    // deterministic across runs (the range-partitioned rank must not
    // shift with partitioning noise)
    val again = KMeans.q237ClusterPrune(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.toSeq == again.toSeq)
  }
}
