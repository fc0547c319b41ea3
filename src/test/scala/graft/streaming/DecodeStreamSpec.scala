package graft.streaming

import graft.SparkSpec
import graft.operators.Multimodal

class DecodeStreamSpec extends SparkSpec {

  test("q148 streamed decode equals the batch decode of the same assets") {
    val streamed = DecodeStream.q148StreamDecode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(streamed.length == n, "every payload must decode exactly once")
    // batch twin: the staged asset table through the batch decoder
    val batch = Multimodal.decodeImages(Multimodal.imageAssets(spark, sf))
      .collect()
      .map(d => (d.doc_id, d.format, d.width.toLong, d.height.toLong,
        d.n_pixels, d.sum_gray)).sortBy(_._1).toSeq
    assert(streamed == batch, "in-flight decode must equal the batch decode")
    // and the decoded rasters match the generating formula end to end
    streamed.foreach { case (docId, _, w, h, np, sum) =>
      assert(np == w * h)
      val expect = (for (y <- 0 until h.toInt; x <- 0 until w.toInt)
        yield Multimodal.ImageFixture.pixel(docId, x, y).toLong).sum
      assert(sum == expect, s"doc $docId decoded sum $sum != formula $expect")
    }
  }
}
