package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalSpec extends SparkSpec {

  test("asofJoin picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (2L, 9L, "z"))
      .toDF("k", "t", "tag")
    val got = Temporal.asofJoin(
      left, right, col("k"), col("k"), col("t"), col("t"),
      payload = struct(col("tag")))
      .select(col("lid"), col("asof.tag").as("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(100L) == Some("b")) // equal time matches (inclusive)
    assert(got(101L) == Some("c")) // latest before 25
    assert(got(102L) == None)      // right row is after left time → no match
  }

  test("sessionization counts restart after the gap") {
    import spark.implicits._
    val us = 1000000L
    val ev = Seq(
      (1L, 0L * us), (2L, 60L * us), (3L, 3600L * us), // user 7: 2 sessions
      (4L, 0L * us)) // user 8: 1 session
      .map { case (id, t) => (id, new java.sql.Timestamp(t / 1000), if (id <= 3) 7L else 8L, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.createOrReplaceTempView("tmp_events")
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts")
    val cum = byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val sessions = ev
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("gap_us").isNull || col("gap_us") > Temporal.SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy("user_id").agg(max("session_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions(7L) == 2L && sessions(8L) == 1L)
  }

  test("binned range join equals the naive BETWEEN join, including edge-touching points") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // crafted: intervals longer and shorter than the bin, overlapping
    // intervals on one key, points exactly on start/end boundaries,
    // points outside every interval, and a key with no intervals
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val points = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(30)), (3L, 10L, ts(45)), (4L, 10L, ts(200)),
      (5L, 20L, ts(10)), (6L, 30L, ts(10))).toDF("pid", "key", "t")
    val intervals = Seq(
      (100L, 10L, ts(0), ts(30)),    // touches points 1 (start) and 2 (end)
      (101L, 10L, ts(25), ts(120)),  // overlaps the first; spans >1 bin
      (102L, 20L, ts(0), ts(5))).toDF("iid", "ikey", "s", "e")
    val got = Temporal.rangeJoin(points, intervals,
        col("key"), col("ikey"), col("t"), col("s"), col("e"),
        binWidthUs = 30L * 60 * 1000000)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("key") === col("ikey") && col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L)))
  }

  test("q57 assigns every event to exactly one session") {
    val assigned = Temporal.q57RangeJoin(spark, sf)
    val n = assigned.count()
    assert(n == graft.core.Tables.events(spark, sf).count())
    assert(assigned.select("event_id").distinct().count() == n)
  }

  test("dedup apply elects exactly one keeper per near-dup cluster") {
    val rows = Dedup.q38DedupApply(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (keeper, members) =>
      assert(members.count(_.getBoolean(2)) == 1, s"cluster $keeper keeper count")
      assert(members.map(_.getLong(0)).min == keeper, "keeper is the min doc_id")
    }
    // every paired doc appears exactly once
    val pairDocs = Dedup.q26NgramJaccard(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(_.getLong(0)).toSet == pairDocs)
  }
}
