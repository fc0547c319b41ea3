package graft.layout

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange

import graft.core.Tables

/** Physical-layout manager: bucketed fact tables for shuffle-free
  * co-located joins (the 100 TB design lever the flat parquet fixtures
  * can't express).
  *
  * Rationale: `lineitem ⋈ orders` on orderkey is the workload's one
  * fact-fact join. On flat files every such join shuffles both sides —
  * at 100 TB that is the dominant cost, repeated per query. Bucketing
  * both tables by the join key at ingest time moves that shuffle to
  * write time, once: every subsequent join on the key is planned as a
  * zero-Exchange SortMergeJoin (bucket-to-bucket, locally sorted).
  *
  * Sizing: `buckets` should target ~128-256 MB per bucket file at the
  * cluster scale (100 TB lineitem → O(500k) buckets); here it defaults
  * small to match the fixtures. Bucket pruning additionally turns
  * point-lookups on the key into single-bucket scans.
  */
object BucketedLayout {

  val FactKey = "o_orderkey"

  /** Write lineitem + orders as bucketed, sorted tables into `db`,
    * stored under `path`. One-time layout cost (the write shuffles on
    * the bucket key); every later key-join is shuffle-free. */
  def bucketize(spark: SparkSession, sfDir: String, db: String,
      path: String, buckets: Int = 8): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.lineitem(spark, sfDir)
      .write.mode(SaveMode.Overwrite)
      .option("path", s"$path/lineitem_b")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .format("parquet")
      .saveAsTable(s"$db.lineitem_b")
    Tables.orders(spark, sfDir)
      .write.mode(SaveMode.Overwrite)
      .option("path", s"$path/orders_b")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .format("parquet")
      .saveAsTable(s"$db.orders_b")
  }

  /** Exchange nodes in an executed plan, INCLUDING those hidden inside
    * AQE query stages — `plan.collect` alone misses them because
    * [[QueryStageExec]] is a leaf whose materialized subtree hangs off
    * `.plan`, not `children` (a silent false-negative for any
    * "is this shuffle-free?" assertion). */
  def collectExchanges(plan: SparkPlan): Seq[String] = plan match {
    case a: AdaptiveSparkPlanExec => collectExchanges(a.executedPlan)
    // recurse through stage boundaries; the stage wrapper itself is only
    // a shuffle if its materialized subtree starts with an Exchange
    // (ResultQueryStage wraps the final stage and is not a shuffle)
    case q: QueryStageExec => collectExchanges(q.plan)
    case e: Exchange => e.nodeName +: e.children.flatMap(collectExchanges)
    case p => p.children.flatMap(collectExchanges)
  }

  /** The co-located join: order revenue rollup over the bucketed pair.
    * With both sides bucketed+sorted on the key, Catalyst plans
    * SortMergeJoin with NO Exchange on either side. */
  def colocatedOrderRevenue(spark: SparkSession, db: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table(s"$db.orders_b")
      .join(spark.table(s"$db.lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
  }
}
