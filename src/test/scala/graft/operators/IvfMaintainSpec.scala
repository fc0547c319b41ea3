package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfMaintainSpec extends SparkSpec {

  test("q170 maintenance report reconciles: every vector lands in exactly one cluster") {
    val rep = IvfMaintain.q170IncrementalIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rep.nonEmpty)
    val total = graft.core.Tables.embeddings(spark, sf).count()
    val nV1 = graft.core.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % Corpus.DroppedFromV1Mod =!= Corpus.DroppedFromV1Rem).count()
    assert(rep.map(_._2).sum == nV1, "v1 members partition the v1 slice")
    assert(rep.map(_._4).sum == total - nV1, "added members partition the delta")
    assert(total - nV1 > 0, "fixture delta must be non-empty (trap armed)")
    rep.foreach { case (cluster, n1, d1, na, da, drift) =>
      assert(cluster >= 0 && cluster < KMeans.K)
      assert(n1 >= 0 && na >= 0 && d1 >= 0 && da >= 0)
      // the drift verdict is the integer cross-multiplication, replayed
      assert(drift == (da * n1 > d1 * na * 2))
      // an empty slice cannot drift (0 > 0 is false)
      if (na == 0) assert(!drift)
    }
  }

  test("q170 delta assignment agrees with a direct assignment against the frozen v1 centroids") {
    // the maintenance path must route the delta through the SAME frozen
    // centroids the v1 training produced — recompute one delta vector's
    // cluster by brute force on the driver
    val q = KMeans.quantized(spark, sf)
    val isV1 = col("vec_id") % Corpus.DroppedFromV1Mod =!= Corpus.DroppedFromV1Rem
    val cents = KMeans.trainedCentroidsOf(spark, sf, "v1", q.filter(isV1))
    val delta = q.filter(!isV1).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    assert(delta.nonEmpty)
    val expected = delta.map { case (id, em) =>
      val best = cents.map { case (j, c) =>
        (em.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }.min
      (id, best._2.toLong)
    }.toMap
    val got = KMeans.assigned(q.filter(!isV1), cents).collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(got == expected)
  }
}
