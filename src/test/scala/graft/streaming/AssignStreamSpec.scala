package graft.streaming

import graft.SparkSpec
import graft.operators.KMeans

class AssignStreamSpec extends SparkSpec {

  test("q135 streamed assignment equals the batch assignment against the trained centroids") {
    val streamed = AssignStream.q135StreamAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(streamed.length == n, "every vector must be assigned exactly once")
    // batch twin over the SAME cached centroids and shared assignment code
    val batch = KMeans.assigned(
        KMeans.quantized(spark, sf), KMeans.trainedCentroids(spark, sf))
      .select("vec_id", "cluster", "d").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).sorted.toSeq
    assert(streamed == batch, "ingest-time scoring must equal the batch pass")
    // every trained cluster id is within range; distances non-negative
    streamed.foreach { case (_, c, d) =>
      assert(c >= 0 && c < KMeans.K && d >= 0)
    }
  }
}
