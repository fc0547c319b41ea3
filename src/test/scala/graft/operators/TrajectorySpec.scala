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

  test("q239: transitions stop at session breaks and replay driver-side") {
    import spark.implicits._
    val gapUs = Trajectory.TrajectoryGapMin * 60L * 1000000L
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(us: Long) = new java.sql.Timestamp(t0.getTime + us / 1000)
    // user 1: a>b>a in one session, then a break, then b>a;
    // user 2: a single event (no transitions)
    val ev = Seq(
      (1L, at(0L), 10L, "a"), (1L, at(1000000L), 11L, "b"),
      (1L, at(2000000L), 12L, "a"),
      (1L, at(2000000L + gapUs + 1000000L), 13L, "b"),
      (1L, at(2000000L + gapUs + 2000000L), 14L, "a"),
      (2L, at(0L), 20L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Trajectory.transitionsOver(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // transitions: a->b (x1, session 1), b->a (x2: session 1 + session 2);
    // the gap pair (a at t2 -> b after the break) must NOT count
    assert(got.toSeq == Seq(
      ("a", "b", 1L, 1L, 1000000L),
      ("b", "a", 2L, 2L, 1000000L)))
  }

  test("q239 conserves q207's transition mass on the fixture corpus") {
    val m = Trajectory.q239TransitionMatrix(spark, sf)
    // per-from totals reconcile with the cells
    val cells = m.groupBy("from_type")
      .agg(sum(col("n")).as("s"), first(col("n_from")).as("f")).collect()
    cells.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
    // total transitions = sum over sessions of (n_events - 1)
    val total = m.agg(sum(col("n"))).collect()(0).getLong(0)
    val fromSessions = Trajectory.q207SessionTrajectories(spark, sf)
      .agg(sum(col("n_events") - 1)).collect()(0).getLong(0)
    assert(total == fromSessions,
      s"transition mass $total != session mass $fromSessions")
  }

  test("q240: overlapping flows count and the top-k is deterministic") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    // one session a>b>a>b>a: flows a>b>a (x2), b>a>b (x1)
    val ev = (0 until 5).map(i =>
      (1L, at(i.toLong), 10L + i, if (i % 2 == 0) "a" else "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Trajectory.flowsOver(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a>b>a", 2L), ("b>a>b", 1L)))
    val again = Trajectory.q240FlowMining(spark, sf).collect().toSeq
    assert(again == Trajectory.q240FlowMining(spark, sf).collect().toSeq)
  }

  test("q241: a planted improbable step is flagged, the common path is not") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    // 20 users walk a>b; one walks a>c -> p(a>c) = 1/21 << floor,
    // p(a>b) = 20/21 >> floor
    val common = (1 to 20).flatMap(u => Seq(
      (u.toLong, at(0L), u * 10L, "a"), (u.toLong, at(1L), u * 10L + 1, "b")))
    val odd = Seq((21L, at(0L), 210L, "a"), (21L, at(1L), 211L, "c"))
    val ev = (common ++ odd).toDF("user_id", "ts", "event_id", "event_type")
    val got = Trajectory.rareOver(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq((21L, 211L, "a", "c", 1000000L / 21L)))
  }

  test("q241 flags are exactly the sub-floor mass of the q239 matrix (fixture corpus)") {
    val m = Trajectory.q239TransitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(4))).toMap
    val flagged = Trajectory.q241RareTransitions(spark, sf).collect()
    // every flagged row carries its cell's p, below the floor
    flagged.foreach { r =>
      val (_, p) = m((r.getString(2), r.getString(3)))
      assert(p == r.getLong(4) && p < Trajectory.RareMicro)
    }
    // and the flag count equals the total n of sub-floor cells
    val expected = m.values.collect { case (n, p) if p < Trajectory.RareMicro => n }.sum
    assert(flagged.length.toLong == expected)
  }

  test("q242: the at-ingest screen drains exactly the batch audit's rows") {
    val stream = graft.streaming.TransitionStream.q242StreamTransitionScreen(spark, sf)
    val batch = Trajectory.q241RareTransitions(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "stream screen diverged from the batch audit")
  }
}
