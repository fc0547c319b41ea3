package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Trajectory

class TrajectoryStreamSpec extends SparkSpec {

  test("q208 emits exactly the watermark-closed sessions of the batch twin") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("user_id")),
        r.getTimestamp(r.fieldIndex("session_start")).getTime,
        r.getLong(r.fieldIndex("n_events")),
        r.getString(r.fieldIndex("trajectory")))
    val streamed = TrajectoryStream.q208StreamTrajectories(spark, sf)
      .collect().map(key).sorted.toSeq
    val ev = graft.core.Tables.events(spark, sf)
    val horizonUs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) -
      60L * 1000000L - Trajectory.TrajectoryGapMin * 60L * 1000000L
    val closed = Trajectory.assembledFull(
        ev.select("user_id", "ts", "event_id", "event_type"))
      .filter(unix_micros(col("last_ev")) <= horizonUs)
      .collect().map(key).sorted.toSeq
    assert(streamed == closed,
      "stream emission must equal batch sessions closed below the watermark")
    assert(streamed.nonEmpty)
  }
}
