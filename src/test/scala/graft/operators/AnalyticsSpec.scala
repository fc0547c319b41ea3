package graft.operators

import graft.SparkSpec
import graft.layout.BucketedLayout

class AnalyticsSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    BucketedLayout.collectExchanges(df.queryExecution.executedPlan)
      .count(_.toLowerCase.contains("shuffle"))
  }

  /** Final-plan text only (AQE's toString repeats the initial plan, which
    * would double-count scans). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  /** Number of parquet scans in a formatted plan (each scan prints once in
    * the tree and once as a numbered detail header — count the headers). */
  private def scanCount(plan: String): Int =
    raw"\(\d+\) Scan parquet".r.findAllIn(plan).length

  test("q83 pivot: declared values, one fact scan, cells match direct filters") {
    val df = Analytics.q83Pivot(spark, sf)
    val rows = df.collect()
    assert(rows.length == 5) // one per priority
    assert(df.columns.toSeq ==
      Seq("o_orderpriority", "F_n", "F_total", "O_n", "O_total", "P_n", "P_total"))
    // cross-check one cell against a direct conditional count
    val orders = graft.core.Tables.orders(spark, sf)
    val p1 = rows.find(_.getString(0) == "1-URGENT").get
    val direct = orders.filter("o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'").count()
    assert(p1.getLong(df.columns.indexOf("F_n")) == direct)
    // declared pivot values ⇒ single pass over orders (no discovery job)
    val plan = finalPlan(df)
    assert(scanCount(plan) == 1, s"q83 should scan orders exactly once\n$plan")
  }

  test("q84 funnel: stage counts are monotone and match a 3-join reference") {
    import org.apache.spark.sql.functions._
    val r = Analytics.q84Funnel(spark, sf).collect().head
    val (nUsers, nView, nClick, nPurchase) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nUsers >= nView && nView >= nClick && nClick >= nPurchase)
    assert(nPurchase > 0, "fixture should funnel some users all the way through")
    // reference: explicit stepwise joins (the formulation the window
    // version replaces) must agree on every stage count
    val e = graft.core.Tables.events(spark, sf).select("user_id", "event_type", "ts")
    val v = e.filter("event_type = 'view'").groupBy("user_id").agg(min("ts").as("t1"))
    val c = e.filter("event_type = 'click'").join(v, "user_id")
      .filter(col("ts") > col("t1")).groupBy("user_id").agg(min("ts").as("t2"))
    val p = e.filter("event_type = 'purchase'").join(c, "user_id")
      .filter(col("ts") > col("t2")).groupBy("user_id").agg(min("ts").as("t3"))
    assert(nView == v.count() && nClick == c.count() && nPurchase == p.count())
  }

  test("q84 funnel: one event-log scan, windows and reduce share one shuffle") {
    val df = Analytics.q84Funnel(spark, sf)
    val plan = finalPlan(df)
    assert(scanCount(plan) == 1, s"q84 must scan the event log exactly once\n$plan")
    // user_id hash shuffle + the 1-row global rollup; a third would mean
    // the user-grain reduce stopped riding the window partitioning
    assert(shuffles(df) <= 2, s"q84 shuffle count regressed\n$plan")
  }

  test("q85 moving average: warm-up frames, integer-exact window arithmetic") {
    val rows = Analytics.q85MovingAvg(spark, sf).collect()
    assert(rows.length > 100)
    val first = rows.head
    // frame of size 1: ma7 == day_total, delta is null
    assert(math.abs(first.getDouble(3) - first.getDouble(2)) < 1e-9)
    assert(first.isNullAt(4))
    // steady state: ma7 equals the mean of the last 7 day totals
    val idx = 100
    val last7 = (idx - 6 to idx).map(i => rows(i).getDouble(2))
    assert(math.abs(rows(idx).getDouble(3) - last7.sum / 7) < 1e-3)
  }

  test("q89 winsorized stats: ~10% clamped, robust mean inside the bounds") {
    val df = Analytics.q89Winsorized(spark, sf)
    val rows = df.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, nClamped) = (r.getLong(1), r.getLong(2))
      val (lo, hi) = (r.getDouble(3), r.getDouble(4))
      val (rawAvg, winAvg) = (r.getDouble(5), r.getDouble(6))
      assert(lo < hi)
      // nearest-rank p05/p95 ⇒ strictly-outside rows are < 10% + rank slack
      assert(nClamped <= n / 10 + 2 && nClamped > 0,
        s"${r.getString(0)}: $nClamped of $n clamped")
      assert(winAvg >= lo && winAvg <= hi)
      // clamping a right-skewed distribution pulls the mean, slightly
      assert(math.abs(winAvg - rawAvg) < (hi - lo),
        s"winsorized mean implausibly far from raw: $winAvg vs $rawAvg")
    }
    // one fact scan; rank window + final sort are the only shuffles
    val plan = finalPlan(df)
    assert(scanCount(plan) == 1, s"q89 must scan orders once\n$plan")
    assert(shuffles(df) <= 2, s"q89 shuffle count regressed\n$plan")
  }

  test("q85 windows run over the day-grain aggregate, not the fact table") {
    val df = Analytics.q85MovingAvg(spark, sf)
    val plan = finalPlan(df)
    // the single-partition sort the window needs must sit ABOVE the
    // partial-aggregated day frame: exactly one scan, and the hash
    // aggregate appears below the Window node in the tree
    assert(scanCount(plan) == 1)
    val aggPos = plan.indexOf("HashAggregate")
    val winPos = plan.indexOf("Window")
    assert(aggPos >= 0 && winPos >= 0 && winPos < plan.lastIndexOf("HashAggregate"),
      s"q85 window should consume the day-grain aggregate\n$plan")
  }

  test("q93 revenue trend: slope matches a driver-side OLS recompute") {
    val rows = Analytics.q93RevenueTrend(spark, sf).collect()
    assert(rows.length == 5)
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderdate", "o_totalprice").collect()
    rows.foreach { r =>
      val pr = r.getString(0)
      val pts = orders.filter(_.getString(0) == pr).map { o =>
        val days = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(2000, 1, 1),
          o.getAs[java.time.LocalDateTime](1).toLocalDate).toDouble
        (days, math.round(o.getDouble(2) * 100).toDouble)
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(2) - slope) < 1e-3,
        s"$pr: got ${r.getDouble(2)}, want $slope")
      assert(r.getLong(1) == pts.length)
    }
  }

  test("q96 outliers: stats match a driver recompute, 3-sigma rate is sane") {
    val rows = Analytics.q96ValueOutliers(spark, sf).collect()
    assert(rows.length == 5)
    val events = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
    rows.foreach { r =>
      val t = r.getString(0)
      val ys = events.filter(_._1 == t).map(_._2.toDouble)
      val n = ys.length.toDouble
      val mean = ys.sum / n
      val sd = math.sqrt((n * ys.map(y => y * y).sum - ys.sum * ys.sum) / (n * (n - 1)))
      assert(r.getLong(1) == ys.length)
      assert(math.abs(r.getDouble(3) - mean / 100.0) < 0.01)
      assert(math.abs(r.getDouble(4) - sd / 100.0) < 0.01)
      val outliers = ys.count(y => math.abs(y - mean) > 3 * sd)
      assert(r.getLong(2) == outliers, s"$t: ${r.getLong(2)} vs $outliers")
      assert(outliers < ys.length / 20, "3-sigma flags must be rare")
    }
  }

  test("q102 cohort retention semantics on a sparse crafted frame") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // cohort of Jan-1 week: users 1,2; only user 1 returns the next week.
    // cohort of Jan-8 week: user 3.
    val events = Seq(
      (1L, t(1)), (2L, t(2)), (1L, t(9)), (3L, t(10)))
      .toDF("user_id", "ts")
    val rows = Analytics.cohortRetention(events).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", 0, 2L, 1.0),
      ("2024-01-01", 1, 1L, 0.5),
      ("2024-01-08", 0, 1L, 1.0)))
  }

  test("q155 anomaly semantics on a crafted volume series: spike, drop, warm-up, exclusion") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // type A: 10/day for 7 days, then a 25-event spike, then a 4-event drop
    val a = (1 to 7).flatMap(d => Seq.fill(10)(("A", t(d)))) ++
      Seq.fill(25)(("A", t(8))) ++ Seq.fill(4)(("A", t(9)))
    // type B: only 2 days of history — below the min-history floor, no rows
    val b = Seq.fill(5)(("B", t(1))) ++ Seq.fill(5)(("B", t(2))) ++
      Seq.fill(50)(("B", t(3)))
    val events = (a ++ b).toDF("event_type", "ts")
    val rows = Analytics.ingestAnomaly(events).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getBoolean(5), r.getBoolean(6)))
    // warm-up: days 1-3 of A have < 3 trailing days → absent
    assert(!rows.exists(r => r._1 == "A" && r._2 <= "2024-01-03"))
    // day 8: trailing mean 10, count 25 → spike (25·7 > 70·2), not drop
    assert(rows.contains(("A", "2024-01-08", 25L, true, false)))
    // day 9: trailing window now CONTAINS the spike (mean ≈ 12.1) —
    // 4·7·2 = 56 < 85 → drop; the spike itself is excluded from its own
    // window (else day 8 could never flag)
    assert(rows.contains(("A", "2024-01-09", 4L, false, true)))
    // B's 50-event day 3 has only 2 days of history → filtered
    assert(!rows.exists(_._1 == "B"))
  }
}
