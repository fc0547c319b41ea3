package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.HeavyHittersStream.{MgOut, MgState, TokRow}

class HeavyHittersStreamSpec extends SparkSpec {

  private def state(v: Option[MgState]) = TestGroupState.create[MgState](
    optionalState = v.map(org.apache.spark.api.java.Optional.of[MgState])
      .getOrElse(org.apache.spark.api.java.Optional.empty[MgState]()),
    timeoutConf = GroupStateTimeout.NoTimeout,
    batchProcessingTimeMs = 0L,
    eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
    hasTimedOut = false)

  private def run(tokens: Seq[String], prev: Option[MgState]): (Seq[MgOut], MgState) = {
    val s = state(prev)
    val out = HeavyHittersStream.mgUpdate(0, tokens.iterator.map(TokRow(0, _)), s).toSeq
    (out, s.get)
  }

  test("mgUpdate keeps exact counts under k distinct and carries state across batches") {
    val (out1, s1) = run(Seq("a", "b", "a", "c", "a"), None)
    assert(s1.seen == 5)
    assert(out1.map(o => o.token -> o.est).toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    assert(out1.forall(_.version == 5))
    // second batch resumes the same counters
    val (out2, s2) = run(Seq("b", "b"), Some(s1))
    assert(s2.seen == 7)
    assert(out2.map(o => o.token -> o.est).toMap == Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
  }

  test("mgUpdate never exceeds k counters and survives adversarial churn") {
    // k+many distinct singletons then a genuinely heavy token
    val k = HeavyHittersStream.SketchK
    val churn = (1 to 10 * k).map(i => s"t$i")
    val heavy = Seq.fill(3 * k)("HH")
    val (out, s) = run(scala.util.Random.shuffle(churn ++ heavy), None)
    assert(s.counters.size <= k, s"${s.counters.size} counters > k=$k")
    // MG guarantee: count(HH) = 3k > n/(k+1) = 13k/(k+1) ⇒ HH survives
    assert(out.exists(_.token == "HH"), "true heavy hitter evicted — MG broken")
  }

  test("q145: streamed candidates cover every true heavy hitter; gate verdicts hold") {
    val cands = HeavyHittersStream.streamCandidates(spark, sf)
      .select("token").collect().map(_.getString(0)).toSet
    assert(cands.nonEmpty)
    assert(cands.size <= HeavyHittersStream.Shards * HeavyHittersStream.SketchK)
    // direct batch recount of the heavy set
    val occ = graft.operators.TextOps.tokenStage(spark, sf)
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = occ.map(_._2).sum
    val heavy = occ.filter { case (_, c) => c * (HeavyHittersStream.SketchK + 1) > n }
    assert(heavy.forall(h => cands.contains(h._1)),
      s"missed heavy hitters: ${heavy.filterNot(h => cands.contains(h._1)).take(5).toSeq}")
    val gate = HeavyHittersStream.q145StreamHeavyHitters(spark, sf).collect()
    assert(gate.length == 1)
    assert(gate.head.getLong(0) == n)
    assert(gate.head.getLong(1) == heavy.length.toLong)
    assert(gate.head.getBoolean(2), "heavy_covered false")
    assert(gate.head.getBoolean(3), "sketch_bounded false")
  }
}
