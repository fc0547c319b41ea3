package graft.jobs

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange

import graft.core.{Sessions, Tables}
import graft.layout.BucketedLayout

/** Demonstrates the bucketed fact layout (SURVEY §8, 100 TB posture):
  * writes lineitem/orders bucketed by orderkey, runs the co-located
  * join, and prints whether the physical plan shuffled — alongside the
  * same join over flat files for contrast.
  *
  * Usage: runMain graft.jobs.LayoutDemo <sfDir> <workDir> [buckets]
  */
object LayoutDemo {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LayoutDemo <sfDir> <workDir> [buckets]")
    val (sfDir, work) = (args(0), args(1))
    val buckets = if (args.length > 2) args(2).toInt else 8
    val spark = Sessions.local("graft-layout-demo", 8)
    spark.sparkContext.setLogLevel("ERROR")
    // disable broadcast so the join strategy (SMJ) shows the layout effect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def exchangesOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect()
      graft.layout.BucketedLayout.collectExchanges(df.queryExecution.executedPlan)
    }

    println(s"[layout] bucketizing into $work (buckets=$buckets)...")
    val t0 = System.nanoTime()
    BucketedLayout.bucketize(spark, sfDir, "graft_layout", work, buckets)
    println(f"[layout] bucketize done in ${(System.nanoTime() - t0) / 1e9}%.1fs (one-time write shuffle)")

    val bucketed = BucketedLayout.colocatedOrderRevenue(spark, "graft_layout")
    val exB = exchangesOf(bucketed)
    println(s"[layout] bucketed join: rows=${bucketed.count()} exchanges=${if (exB.isEmpty) "NONE (co-located)" else exB.mkString(", ")}")

    import org.apache.spark.sql.functions._
    val flat = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    val exF = exchangesOf(flat)
    println(s"[layout] flat join:     rows=${flat.count()} exchanges=${exF.size} (${exF.mkString(", ")})")
    spark.stop()
  }
}
