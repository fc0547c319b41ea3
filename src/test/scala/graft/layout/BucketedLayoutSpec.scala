package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

class BucketedLayoutSpec extends SparkSpec {

  test("bucketed fact join plans with zero shuffles and matches the flat join") {
    val path = Files.createTempDirectory("graft_bucketed").toString
    BucketedLayout.bucketize(spark, sf, "graft_layout", path, buckets = 4)
    // force a real SMJ so the bucket layout (not broadcast) is what
    // eliminates the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedLayout.colocatedOrderRevenue(spark, "graft_layout")
      joined.collect() // finalize AQE
      // the aggregate after the join reuses the bucket partitioning too —
      // assert no Exchange anywhere, including inside AQE query stages
      val exchanges = BucketedLayout.collectExchanges(joined.queryExecution.executedPlan)
      assert(exchanges.isEmpty,
        s"expected shuffle-free bucketed join, found: $exchanges")

      // sanity: the SAME traversal must SEE shuffles on the flat join —
      // guards against the assertion passing vacuously
      import org.apache.spark.sql.functions._
      val flatJoin = graft.core.Tables.orders(spark, sf)
        .join(graft.core.Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"))
      flatJoin.collect()
      val flatExchanges = BucketedLayout.collectExchanges(flatJoin.queryExecution.executedPlan)
      assert(flatExchanges.nonEmpty, "traversal failed to see shuffles in the flat join")

      // value parity with the flat-file join
      import org.apache.spark.sql.functions._
      val flat = graft.core.Tables.orders(spark, sf)
        .join(graft.core.Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("revenue"))
      val a = joined.select("o_orderkey", "revenue").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
      val b = flat.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_layout.lineitem_b")
      spark.sql("DROP TABLE IF EXISTS graft_layout.orders_b")
    }
  }

  test("bucketize over existing files re-registers without rewriting") {
    val path = Files.createTempDirectory("graft_bucketed_reuse").toString
    try {
      BucketedLayout.bucketize(spark, sf, "graft_layout_r", path, buckets = 4)
      def mtimes: Map[String, Long] = {
        val d = new java.io.File(s"$path/lineitem_b")
        d.listFiles().map(f => f.getName -> f.lastModified()).toMap
      }
      val before = mtimes
      // simulate a fresh session's empty in-memory catalog: drop the DDL,
      // keep the files — the next bucketize must re-register (pure DDL),
      // not pay the layout write again
      spark.sql("DROP TABLE graft_layout_r.lineitem_b")
      spark.sql("DROP TABLE graft_layout_r.orders_b")
      spark.sql("DROP DATABASE graft_layout_r")
      BucketedLayout.bucketize(spark, sf, "graft_layout_r", path, buckets = 4)
      assert(mtimes == before, "re-registration must not rewrite the bucket files")
      // and the re-registered tables still join shuffle-free
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = BucketedLayout.colocatedOrderRevenue(spark, "graft_layout_r")
        joined.collect()
        val exchanges = BucketedLayout.collectExchanges(joined.queryExecution.executedPlan)
        assert(exchanges.isEmpty,
          s"expected shuffle-free join over re-registered layout, found: $exchanges")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_layout_r.lineitem_b")
      spark.sql("DROP TABLE IF EXISTS graft_layout_r.orders_b")
      spark.sql("DROP DATABASE IF EXISTS graft_layout_r")
    }
  }

  test("q55 runs shuffle-free over the ensured layout and reuses it") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q55 = BucketedLayout.q55ColocatedJoin(spark, sf)
      q55.collect()
      // orderBy adds a range-exchange for the final presentation sort;
      // the JOIN+AGG core must be shuffle-free — assert by counting:
      // flat equivalent has join exchanges (2) + agg reuse + sort
      val exchanges = BucketedLayout.collectExchanges(q55.queryExecution.executedPlan)
      assert(exchanges.size <= 1,
        s"q55 core should be shuffle-free (≤1 presentation-sort exchange), found: $exchanges")
      // ensure() is idempotent per corpus version: same db, no rewrite
      val db1 = BucketedLayout.ensure(spark, sf)
      val db2 = BucketedLayout.ensure(spark, sf)
      assert(db1 == db2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("q97 funnel runs with no data shuffle over the bucketed event log") {
    val df = BucketedLayout.q97FunnelBucketed(spark, sf)
    val row = df.collect().head
    // identical values to the flat-log funnel
    val flat = graft.operators.Analytics.q84Funnel(spark, sf).collect().head
    assert(row == flat)
    // the bucket layout satisfies the window + reduce clustering: the
    // only Exchange left is the 1-row global roll-up (SinglePartition)
    val exchanges = BucketedLayout.collectExchanges(df.queryExecution.executedPlan)
    val dataShuffles = exchanges.filter(_.toLowerCase.contains("shuffle"))
    assert(dataShuffles.size <= 1, s"unexpected shuffles: $exchanges")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(user_id"),
      s"funnel re-shuffled the bucketed log\n$plan")
  }
}
