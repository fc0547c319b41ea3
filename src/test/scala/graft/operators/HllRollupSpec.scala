package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HllRollupSpec extends SparkSpec {

  test("q187 verdicts hold: union-merged estimate equals the one-pass estimate, all within bound") {
    val rows = HllRollup.q187HllRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: estimate out of bound")
      assert(r.getBoolean(3), s"${r.getString(0)}: merged != direct")
    }
    val global = rows.filter(_.getString(0) == "ALL")
    assert(global.length == 1)
    // per-scope exacts bound the global from above (unions only shrink)
    val sumTypes = rows.filterNot(_.getString(0) == "ALL").map(_.getLong(1)).sum
    assert(global(0).getLong(1) <= sumTypes)
  }

  test("sketch union is the register-max monoid: merge of arbitrary shards = one pass") {
    // split the events three ways by user hash, sketch each shard,
    // union — the estimate must EQUAL the unsharded sketch's estimate
    val ev = graft.core.Tables.events(spark, sf)
    val sharded = ev.withColumn("shard", pmod(col("user_id"), lit(3)))
      .groupBy("shard").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    assert(sharded == direct,
      s"3-shard union estimated $sharded, one-pass $direct — re-aggregability broken")
  }
}
