package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MisraGriesAgg

class HeavyHittersSpec extends SparkSpec {

  test("MG candidates are a bounded superset of every item above N/k") {
    import spark.implicits._
    // 100×hot + 60 singletons, k=4: N=160, floor=40 ⇒ hot MUST survive
    // every eviction; buffer stays ≤ 4 entries throughout
    val items = (Seq.fill(100)("hot") ++ (1 to 60).map(i => s"rare_$i"))
    // partition-order independence: the guarantee must hold however the
    // stream is split across buffers
    Seq(1, 7).foreach { parts =>
      val cands = items.toDF("s").repartition(parts)
        .agg(MisraGriesAgg.mg_candidates(col("s"), 4)).head.getSeq[String](0)
      assert(cands.size <= 4, s"sketch exceeded k: $cands")
      assert(cands.contains("hot"), s"true heavy hitter evicted: $cands")
    }
  }

  test("q90 equals the exact vocabulary-shuffle twin") {
    val got = HeavyHitters.q90HeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // exact twin: full GROUP BY over all shingles (the plan q90 avoids)
    val sh = Dedup.shingles(
      graft.core.Tables.documents(spark, sf), TextOps.BoilerK)
    val total = sh.count()
    val floor = total / HeavyHitters.SketchK
    val exact = sh.groupBy("s")
      .agg(count(lit(1)).as("n"), min("doc_id").as("fd"))
      .filter(col("n") > floor).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
    assert(got.nonEmpty, "fixture should contain shingles above the floor")
  }

  test("q90 plan: candidate recount broadcasts, shuffles stay bounded") {
    val df = HeavyHitters.q90HeavyHitters(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate filter must broadcast, never shuffle the shingle stream\n$plan")
    val shuffles = graft.layout.BucketedLayout
      .collectExchanges(df.queryExecution.executedPlan)
      .count(_.toLowerCase.contains("shuffle"))
    assert(shuffles <= 2,
      s"q90 runs $shuffles shuffles (expected ≤ 2: candidate recount + sort)")
  }
}
