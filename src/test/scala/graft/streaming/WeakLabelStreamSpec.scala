package graft.streaming

import graft.SparkSpec
import graft.operators.WeakLabels

class WeakLabelStreamSpec extends SparkSpec {

  test("q204 streamed votes equal the batch labeling frame") {
    val streamed = WeakLabelStream.q204StreamWeakLabels(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sorted.toSeq
    val batch = WeakLabels.labeled(graft.core.Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sorted.toSeq
    assert(streamed == batch,
      "the ingest labeler must be the batch labeling expression, stateless")
    assert(streamed.nonEmpty)
  }
}
