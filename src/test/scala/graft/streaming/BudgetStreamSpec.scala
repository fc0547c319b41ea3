package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec

class BudgetStreamSpec extends SparkSpec {

  private def state(v: Option[Long]) = TestGroupState.create[Long](
    optionalState = v.map(org.apache.spark.api.java.Optional.of[Long])
      .getOrElse(org.apache.spark.api.java.Optional.empty[Long]()),
    timeoutConf = GroupStateTimeout.NoTimeout,
    batchProcessingTimeMs = 0L,
    eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
    hasTimedOut = false)

  test("admitGroup folds in doc_id order and carries the cursor across batches") {
    // budget = 150; deliver out of order to prove the in-group sort
    val s1 = state(None)
    val b1 = BudgetStream.admitGroupForTest(Iterator(
      BudgetStream.DocTok(2L, "A", 60L),
      BudgetStream.DocTok(0L, "A", 50L),
      BudgetStream.DocTok(1L, "A", 30L)), s1).toSeq
    assert(b1.map(a => (a.doc_id, a.cum_tokens)) == Seq((0L, 50L), (1L, 80L), (2L, 140L)))
    assert(s1.get == 140L)
    // second batch: 3 overflows (155 > 150) and the cursor still advances,
    // so 4 is rejected too even though its own tokens would have fit
    val s2 = state(Some(140L))
    val b2 = BudgetStream.admitGroupForTest(Iterator(
      BudgetStream.DocTok(3L, "A", 15L),
      BudgetStream.DocTok(4L, "A", 5L)), s2).toSeq
    assert(b2.isEmpty, "post-overflow docs are never admitted")
    assert(s2.get == 160L, "rejected docs still advance the cursor")
  }

  test("q124 streamed admission equals the batch token-budget fill") {
    val streamed = BudgetStream.q124StreamTokenBudget(spark, sf).collect().toSeq
    val batch = graft.operators.Sampling.q121TokenBudget(spark, sf).collect().toSeq
    assert(streamed == batch)
  }
}
