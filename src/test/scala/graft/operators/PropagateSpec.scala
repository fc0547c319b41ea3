package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PropagateSpec extends SparkSpec {

  test("q168 two-round propagation equals a driver-side replay on the fixture graph") {
    // the fixture pair graph is tiny (dozens of nodes) — replay the exact
    // integer recurrence on the driver and demand bit-equality
    val seeds = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("nt"),
        size(array_distinct(graft.operators.TextOps.tokens(col("text")))).cast("long").as("nd"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.getLong(1) == 0L) 0L
         else math.min(r.getLong(1) * 10000, 1000000) / 2 +
           (r.getLong(2) * 500000) / r.getLong(1)))
      .toMap
    val pairs = Dedup.q27MinhashLsh(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def step(s: Map[Long, Long]): Map[Long, Long] =
      nbrs.map { case (v, ns) =>
        v -> (s(v) + ns.map(s).sum) / (1 + ns.length)
      }
    val expected = step(step(seeds))
    val got = Propagate.q168QualityPropagation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty, "fixture near-dup graph must not be empty")
    assert(got.map(_._1).toSet == nbrs.keySet,
      "exactly the non-isolated docs are emitted")
    got.foreach { case (docId, deg, s0, s2, shift) =>
      assert(deg == nbrs(docId).length.toLong)
      assert(s0 == seeds(docId))
      assert(s2 == expected(docId), s"doc $docId: engine $s2 vs replay ${expected(docId)}")
      assert(shift == s2 - s0)
      // averaging is a convex-hull contraction (up to the −1 truncation
      // slack per round): a smoothed score can never leave its 2-hop
      // closed neighborhood's seed range
      val hood1 = (docId +: nbrs(docId)).distinct
      val hood2 = (hood1 ++ hood1.flatMap(nbrs.getOrElse(_, Seq.empty))).distinct
      val seedVals = hood2.map(seeds)
      assert(s2 >= seedVals.min - 2 && s2 <= seedVals.max,
        s"doc $docId: s2 $s2 outside neighborhood hull [${seedVals.min}, ${seedVals.max}]")
    }
  }
}
