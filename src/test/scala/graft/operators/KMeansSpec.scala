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
}
