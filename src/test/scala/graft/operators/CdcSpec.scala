package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("q185 materializes one row per key ever seen; tombstones read dead with value 0") {
    val ev = graft.core.Tables.events(spark, sf)
    val state = Cdc.q185CdcApply(spark, sf)
    assert(state.count() == ev.select("user_id").distinct().count())
    assert(state.select("user_id").distinct().count() == state.count())
    val deadBad = state.filter(!col("alive") && col("last_value_cents") =!= 0L).count()
    assert(deadBad == 0, "a tombstoned key must read value 0")
    // spot-replay one key end-to-end against a driver-side fold
    val k = ev.select("user_id").limit(1).collect()(0).getLong(0)
    val ops = ev.filter(col("user_id") === k)
      .select(unix_micros(col("ts")), col("event_id"), col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val last = ops.last
    val row = state.filter(col("user_id") === k).collect()(0)
    assert(row.getLong(1) == ops.length)
    assert(row.getBoolean(2) == (last._3 != "error"))
    assert(row.getLong(3) == (if (last._3 == "error") 0L else last._4))
  }

  test("q186 streaming fold equals the q185 batch materialization exactly") {
    assert(canon(graft.streaming.CdcStream.q186StreamCdc(spark, sf)) ==
      canon(Cdc.q185CdcApply(spark, sf)))
  }

  test("streaming fold is arrival-order independent across batches") {
    import graft.streaming.CdcStream.{foldKey, KeyState, OpRow}
    // two permutations of the same op set through the state fold, split
    // across 'batches', must land on the same state
    val ops = Seq(
      OpRow(7L, 1L, 100L, del = false, 10L),
      OpRow(7L, 2L, 100L, del = false, 20L), // same ts: event_id breaks the tie
      OpRow(7L, 3L, 50L, del = true, 0L),
      OpRow(7L, 4L, 200L, del = false, 40L))
    def run(order: Seq[OpRow], splitAt: Int): (Long, Boolean, Long) = {
      var st: Option[KeyState] = None
      val state = new org.apache.spark.sql.streaming.GroupState[KeyState] {
        override def exists: Boolean = st.nonEmpty
        override def get: KeyState = st.get
        override def getOption: Option[KeyState] = st
        override def update(s: KeyState): Unit = st = Some(s)
        override def remove(): Unit = st = None
        override def setTimeoutDuration(d: Long): Unit = ()
        override def setTimeoutDuration(d: String): Unit = ()
        override def setTimeoutTimestamp(t: Long): Unit = ()
        override def setTimeoutTimestamp(t: Long, a: String): Unit = ()
        override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
        override def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
        override def getCurrentWatermarkMs(): Long = 0L
        override def getCurrentProcessingTimeMs(): Long = 0L
        override def hasTimedOut: Boolean = false
      }
      foldKey(7L, order.take(splitAt).iterator, state)
      val out = foldKey(7L, order.drop(splitAt).iterator, state).next()
      (out.n_ops, out.alive, out.last_value_cents)
    }
    val a = run(ops, 2)
    val b = run(ops.reverse, 1)
    val c = run(new scala.util.Random(42).shuffle(ops), 3)
    assert(a == b && b == c, s"fold must be order-independent: $a / $b / $c")
    assert(a == ((4L, true, 40L)))
  }
}
