package graft.streaming

import graft.SparkSpec
import graft.operators.Pq

class PqEncodeStreamSpec extends SparkSpec {

  test("q141 streamed PQ encode equals the batch encode against the trained codebook") {
    val streamed = PqEncodeStream.q141StreamPqEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(streamed.length == n, "every vector must be encoded exactly once")
    // batch twin over the SAME cached codebook and shared encode code
    val batch = Pq.encodeColumns(
        graft.operators.KMeans.quantized(spark, sf), Pq.trainedBook(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(streamed == batch, "ingest-time encoding must equal the batch pass")
    streamed.foreach { case (_, packed, d) =>
      // the pack is exactly invertible: M codes, 4 bits each, big-endian
      assert(packed >= 0 && packed < (1L << (4 * Pq.M)))
      val codes = (0 until Pq.M).map(i => (packed >> (4 * (Pq.M - 1 - i))).toInt & 15)
      assert(codes.forall(c => c >= 0 && c < Pq.K))
      assert(d >= 0)
    }
  }
}
