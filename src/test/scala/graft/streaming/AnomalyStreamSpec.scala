package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Analytics

class AnomalyStreamSpec extends SparkSpec {

  test("streamed anomaly monitor equals the batch verdicts over closed days only") {
    val got = AnomalyStream.q161StreamAnomaly(spark, sf).collect()
      .map(_.toString).toSeq.sorted
    assert(got.nonEmpty)
    // batch twin: same day counts, q34 closed-window filter, same verdicts
    val events = graft.core.Tables.events(spark, sf)
    val mx = events.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val closed = events
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("day").cast("timestamp") + expr("INTERVAL 1 DAY") <=
        lit(mx) - expr("INTERVAL 1 MINUTE"))
    val expect = Analytics.anomalyVerdicts(closed).collect().map(_.toString).toSeq.sorted
    assert(got == expect, "stream-maintained day table must equal the closed-day batch twin")
    // the trailing partial day must NOT appear (no midnight false alarms)
    val lastDay = AnomalyStream.q161StreamAnomaly(spark, sf)
      .agg(max(col("day"))).collect()(0).getDate(0)
    assert(lastDay.toLocalDate.isBefore(
      mx.toLocalDateTime.toLocalDate),
      "the open (partial) day leaked into the monitor")
  }
}
