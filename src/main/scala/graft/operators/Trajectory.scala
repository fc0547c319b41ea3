package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** SESSION-TRAJECTORY ASSEMBLY (SURVEY §2.9 corpus-construction
  * family, beside q63's sequence packing): turn the raw event firehose
  * into ordered per-session action sequences — the
  * "user trajectory" training examples a behavioral / recommendation /
  * agent model consumes (ordered event-type strings, one per
  * gap-bounded session). q44 counts sessions; this ASSEMBLES them:
  * the step from sessionization-as-analytics to
  * sessionization-as-training-data.
  *
  * Gap-based sessionization (a new session opens after
  * [[TrajectoryGapMin]] minutes of silence), then an order-preserving
  * fold of the session's events into one `a>b>c` trajectory string.
  *
  * Scale shape: ONE shuffle by `user_id` (the lag window and the
  * running-sum session id share the same partitioning, so Catalyst
  * plans one Exchange + two Window nodes over it), then the session
  * aggregate reuses that partitioning (group keys prefix-match the
  * window keys). Assembly is `collect_list` of (ts, event_id, type)
  * structs per SESSION — state bounded by session length, never by
  * user history. Ties order by (ts, event_id) on both engines, so the
  * string is deterministic. */
object Trajectory {

  /** Session gap, minutes (fixture-calibrated: 480 min yields
    * multi-event sessions — mean 2.1, max 15 — on the synthetic
    * firehose whose per-user inter-arrival is ~150 min; q44's 30-min
    * analytics gap would fragment it to mean 1.05). */
  val TrajectoryGapMin = 480L

  /** [[assembled]] plus the session's last-event timestamp — the
    * stream twin's emission cutoff needs it (sessions close when the
    * watermark passes `last_ev + gap`). */
  private[graft] def assembledFull(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = TrajectoryGapMin * 60L * 1000000L
    val sessioned = ev
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("brk",
        when(col("gap_us").isNull || col("gap_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned
      .groupBy("user_id", "sess")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("last_ev"),
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            sort_array(collect_list(struct(
              col("ts"), col("event_id"), col("event_type")))),
            e => e.getField("event_type")),
          ">").as("trajectory"))
      .drop("sess")
      .orderBy("user_id", "session_start")
  }

  /** The assembled trajectories over ANY (user_id, ts, event_id,
    * event_type) frame — also the q208 stream twin's batch oracle
    * shape. */
  private[graft] def assembled(ev: DataFrame): DataFrame =
    assembledFull(ev).drop("last_ev")

  /** q207 — assembled trajectories of `dir`'s event stream. */
  def q207SessionTrajectories(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    assembled(Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q207_session_trajectories" -> (q207SessionTrajectories _))

  /** The shared sessionize-and-assemble SQL (also the q208 stream
    * oracle's body): lag-gap chain + running sum, trajectory via
    * ORDER BY (ts, event_id) string_agg. */
  private[graft] def oracleCtes: String =
    s"""g AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    epoch_us(ts) - lag(epoch_us(ts))
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
       |  FROM events),
       |s AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    sum(CASE WHEN gap_us IS NULL
       |             OR gap_us > ${TrajectoryGapMin * 60L * 1000000L}
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
       |  FROM g),
       |sess AS (
       |  SELECT user_id, min(ts) AS session_start, max(ts) AS last_ev,
       |    count(*) AS n_events,
       |    string_agg(event_type, '>' ORDER BY ts, event_id) AS trajectory
       |  FROM s GROUP BY user_id, sess)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q207_session_trajectories" ->
      s"""WITH $oracleCtes
         |SELECT user_id, session_start, n_events, trajectory
         |FROM sess ORDER BY user_id, session_start""".stripMargin)
}
