package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpochPlanSpec extends SparkSpec {

  test("q210 plan invariants: caps bind, allocations never exceed caps or targets") {
    val rows = Sampling.q210EpochPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, epochs, alloc, capped) =
        (r.getLong(1), r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(epochs <= Sampling.MaxEpochsMicro)
      assert(capped == (epochs == Sampling.MaxEpochsMicro))
      assert(alloc == n * epochs / 1000000L, "alloc is the exact capped grant")
      assert(alloc <= n * Sampling.MaxEpochsMicro / 1000000L)
    }
  }

  test("q210 grants more epochs to more diverse sources (uncapped regime)") {
    val rows = Sampling.q210EpochPlan(spark, sf).collect()
      .filter(!_.getBoolean(6))
    // among uncapped sources, epoch order follows weight-per-token order
    val pairs = rows.map(r => (r.getLong(2), r.getLong(1), r.getLong(4)))
    for (a <- pairs; b <- pairs) {
      // same size, strictly higher weight -> at least as many epochs
      if (a._2 == b._2 && a._1 > b._1) assert(a._3 >= b._3)
    }
  }
}
