package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrajectorySpec extends SparkSpec {

  test("gap semantics: strictly-greater gaps break, equal gaps merge") {
    import spark.implicits._
    val gapUs = Trajectory.TrajectoryGapMin * 60L * 1000000L
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(us: Long) = new java.sql.Timestamp(t0.getTime + us / 1000)
    val ev = Seq(
      (1L, at(0L), 10L, "a"),
      (1L, at(gapUs), 11L, "b"),        // exactly gap later -> same session
      (1L, at(2 * gapUs + 1000000L), 12L, "c"), // gap+1s later -> new session
      (2L, at(0L), 20L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Trajectory.assembled(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 2L, "a>b"), (1L, 1L, "c"), (2L, 1L, "x")))
  }

  test("trajectory order ties break by event_id") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, t, 5L, "late"), (1L, t, 3L, "early"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Trajectory.assembled(ev).collect()(0).getString(3)
    assert(got == "early>late")
  }

  test("q207 sessionizes with one user-keyed exchange (plus the output sort)") {
    val df = Trajectory.q207SessionTrajectories(spark, sf)
    df.collect()
    val shuffles = graft.layout.BucketedLayout
      .collectExchanges(df.queryExecution.executedPlan)
      .count(_.toLowerCase.contains("shuffle"))
    assert(shuffles <= 2,
      s"q207 runs $shuffles shuffles (expected ≤ 2: user re-key + sort)")
  }

  test("q207 covers every event exactly once") {
    val total = Trajectory.q207SessionTrajectories(spark, sf)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total == graft.core.Tables.events(spark, sf).count())
  }
}
