package graft.streaming

import graft.SparkSpec

class FunnelStreamSpec extends SparkSpec {

  test("streaming funnel drain equals the batch funnel exactly") {
    val streamed = FunnelStream.q98StreamFunnel(spark, sf).collect().head
    val batch = graft.operators.Analytics.q84Funnel(spark, sf).collect().head
    assert(streamed == batch)
  }

  test("state machine: order-insensitive within a batch, strict across stages") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def run(events: Seq[FunnelStream.EventRow]): FunnelStream.UserFunnel = {
      val state = TestGroupState.create[FunnelStream.FunnelState](
        org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.NoTimeout,
        0L, org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = false)
      FunnelStream.updateState(1L, events.iterator, state)
    }
    def e(t: Long, tpe: String) = FunnelStream.EventRow(t, 1L, tpe)
    // shuffled arrival of a clean v->c->p path still converts
    val full = run(Seq(e(30, "purchase"), e(10, "view"), e(20, "click")))
    assert(full == FunnelStream.UserFunnel(1L, true, true, true))
    // click BEFORE the first view must not count
    val early = run(Seq(e(10, "click"), e(20, "view"), e(30, "purchase")))
    assert(early == FunnelStream.UserFunnel(1L, true, false, false))
    // simultaneous click cannot satisfy the strictly-after rule
    val tie = run(Seq(e(10, "view"), e(10, "click")))
    assert(tie == FunnelStream.UserFunnel(1L, true, false, false))
  }
}
