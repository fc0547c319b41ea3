package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HllRollupSpec extends SparkSpec {

  test("q187 verdicts hold: merged and direct estimates within bound everywhere") {
    val rows = HllRollup.q187HllRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: estimate out of bound")
      assert(r.getBoolean(3), s"${r.getString(0)}: merged estimate out of bound")
    }
    val global = rows.filter(_.getString(0) == "ALL")
    assert(global.length == 1)
    // per-scope exacts bound the global from above (unions only shrink)
    val sumTypes = rows.filterNot(_.getString(0) == "ALL").map(_.getLong(1)).sum
    assert(global(0).getLong(1) <= sumTypes)
  }

  test("sketch union re-aggregability: shard-and-fold stays inside the error budget") {
    // split the events three ways by user hash, sketch each shard,
    // union — the REGISTERS merge by bucket-max exactly, but the
    // published estimate may differ from the one-pass sketch's once
    // past coupon mode: DataSketches estimates a directly-fed sketch
    // with the HIP accumulator (merge-history dependent by design) and
    // a union with the composite estimator. The re-aggregability
    // contract is therefore BUDGET equality, not bit equality (the
    // r10 q187 sf0.1 lesson: bit-equality held at 150 distincts and
    // broke at 1.5k).
    val ev = graft.core.Tables.events(spark, sf)
    val exact = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val sharded = ev.withColumn("shard", pmod(col("user_id"), lit(3)))
      .groupBy("shard").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    val bound = Relational.HllErrorBound
    assert(math.abs(sharded - exact) <= exact * bound,
      s"3-shard union estimated $sharded for $exact exact")
    assert(math.abs(direct - exact) <= exact * bound,
      s"one-pass estimated $direct for $exact exact")
  }

  test("HIP-vs-composite divergence is real past coupon mode (why the gate is budget-based)") {
    import spark.implicits._
    val n = 20000L
    val ids = spark.range(0, n).select(col("id"))
    val direct = ids.agg(
      hll_sketch_estimate(hll_sketch_agg(col("id"))).as("est"))
      .collect()(0).getLong(0)
    val sharded = ids.withColumn("shard", pmod(col("id"), lit(4)))
      .groupBy("shard").agg(hll_sketch_agg(col("id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val bound = Relational.HllErrorBound
    assert(math.abs(direct - n) <= n * bound && math.abs(sharded - n) <= n * bound,
      s"both estimators must hold the budget: direct $direct, sharded $sharded for $n")
  }
}
