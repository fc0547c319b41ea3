package graft.operators

import graft.SparkSpec

class MarginSpec extends SparkSpec {

  private def vecs: Map[Long, Array[Float]] =
    graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosMicro(a: Array[Float], b: Array[Float]): Long = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < a.length) {
      ab += a(i).toDouble * b(i).toDouble
      aa += a(i).toDouble * a(i).toDouble
      bb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val y = 1e6 * ab / math.sqrt(aa * bb)
    if (y >= 0) math.floor(y + 0.5).toLong else -math.floor(-y + 0.5).toLong
  }

  test("q191 equals a from-scratch driver replay of the margin criterion") {
    val v = vecs
    val as = v.keys.filter(_ % 2 == 0).toSeq.sorted
    val bs = v.keys.filter(_ % 2 == 1).toSeq.sorted
    val cm = (for { a <- as; b <- bs } yield (a, b) -> cosMicro(v(a), v(b)))
      .toMap.filter(_._2 > 0)
    def topSum(keyed: Map[Long, Seq[(Long, Long)]]): Map[Long, Long] =
      keyed.map { case (k, cands) =>
        k -> cands.sortBy { case (o, c) => (-c, o) }
          .take(Margin.MarginK).map(_._2).sum
      }
    val fs = topSum(cm.toSeq.groupBy(_._1._1)
      .map { case (a, xs) => a -> xs.map(x => (x._1._2, x._2)) })
    val bsum = topSum(cm.toSeq.groupBy(_._1._2)
      .map { case (b, xs) => b -> xs.map(x => (x._1._1, x._2)) })
    val expect = cm.toSeq
      .map { case ((a, b), c) =>
        (a, b, c, 2 * c * 1000000L / (fs(a) + bsum(b))) }
      .groupBy(_._1)
      .flatMap { case (_, cands) =>
        val best = cands.sortBy { case (_, b, _, m) => (-m, b) }.head
        if (best._4 >= Margin.MarginTauMicro) Some(best) else None
      }
      .toSeq.sortBy(_._1)
    val got = Margin.q191MarginMining(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty, "the miner must admit some pairs on the fixture")
    assert(got == expect, "mined pairs must equal the driver replay")
  }

  test("mined pairs respect the split, the threshold and per-anchor uniqueness") {
    val rows = Margin.q191MarginMining(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1,
        "anchors from side A (even ids), partners from side B (odd ids)")
      assert(r.getLong(2) > 0, "only positive-cosine candidates are minable")
      assert(r.getLong(3) >= Margin.MarginTauMicro)
    }
    val anchors = rows.map(_.getLong(0))
    assert(anchors.distinct.length == anchors.length,
      "one best partner per anchor")
  }

  test("the miner is deterministic") {
    def canon() = Margin.q191MarginMining(spark, sf).collect().map(_.toString).toSeq
    assert(canon() == canon())
  }

  test("q200: the production miner's candidates prune and its recall clears the floor") {
    val r = Margin.q200MarginIvf(spark, sf).collect()(0)
    assert(r.getLong(0) == Margin.q191MarginMining(spark, sf).count(),
      "the exact-pair fact must match the exact miner")
    assert(r.getBoolean(1), "recall of the exact mined set must clear the floor")
    assert(r.getBoolean(2), "the blocked candidate stream must prune the grid")
  }

  test("production mined pairs keep the exact miner's per-pair invariants") {
    val rows = Margin.ivfMinedPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
      assert(r.getLong(2) > 0 && r.getLong(3) >= Margin.MarginTauMicro)
    }
    val anchors = rows.map(_.getLong(0))
    assert(anchors.distinct.length == anchors.length)
  }

  test("the assignment store is rank-prefix-faithful and the miner reads ids only") {
    import org.apache.spark.sql.functions._
    // prefix fidelity: rank<n over the maxN store must reproduce the
    // n-wide in-memory assignment EXACTLY (the sorted insert's
    // prefix-stability claim the q200 hash relies on)
    val emb = graft.core.Tables.embeddings(spark, sf)
    val k = Similarity.semClustersFor(emb.count())
    val centers = IvfIndex.centroids(spark, sf, k)
    val store = spark.read.parquet(Margin.assignStore(spark, sf))
    val n = Similarity.SpillAssign
    val fromStore = store.filter(col("rank") < n)
      .select(col("vec_id"), col("list_id").cast("int").as("list_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val direct = emb.select(col("vec_id"),
        explode(graft.functions.VectorFunctions.nearest_centroids(
          col("embedding"), centers, n)).as("list_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(fromStore == direct,
      "rank-filtered store diverges from the direct n-wide assignment")
    // the candidate-generation scans read ONLY ids from the store —
    // never re-materializing vectors through the list fan-out. Audited
    // on the scored-candidate frame: the rank tail's checkpoint hides
    // this subplan from the final query's executed plan.
    val df = Margin.ivfScoredCandidates(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val storeSchemas = raw"ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
      .filter(_.contains("rank"))
    assert(storeSchemas.nonEmpty, s"no store scans found in\n$plan")
    assert(storeSchemas.forall(s => !s.contains("embedding")),
      s"a store scan reads vectors through the fan-out:\n$storeSchemas")
  }
}
