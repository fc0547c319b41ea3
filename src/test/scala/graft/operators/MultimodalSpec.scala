package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("asset payload is the exact byte content; metadata is typed") {
    val a = Multimodal.assets(spark, sf).filter(_.doc_id == 0L).head()
    val doc = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0L).head()
    assert(new String(a.payload, "UTF-8") == doc.getAs[String]("text"))
    assert(Set("png", "jpeg", "webp").contains(a.format))
    assert(a.width >= 64 && a.height >= 64)
  }

  test("partition-wise decode is deterministic with fixed feature width") {
    val f1 = Multimodal.decodeAll(Multimodal.assets(spark, sf)).collect()
      .sortBy(_.doc_id)
    val f2 = Multimodal.decodeAll(Multimodal.assets(spark, sf)).collect()
      .sortBy(_.doc_id)
    assert(f1.length == f2.length && f1.nonEmpty)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.doc_id == b.doc_id && a.mean_byte == b.mean_byte)
      assert(a.feature.toSeq == b.feature.toSeq)
      assert(a.feature.length == Multimodal.FakeDecoder.FeatureDim)
    }
  }

  test("decode stats aggregate equals per-row recomputation") {
    val feats = Multimodal.decodeAll(Multimodal.assets(spark, sf)).collect()
    val byFormat = feats.groupBy(_.format).view.mapValues(_.length).toMap
    val agg = Multimodal.q33DecodeStats(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == byFormat)
  }

  test("resize fits the target box and subsamples the payload") {
    val out = Multimodal.resizeAll(Multimodal.assets(spark, sf)).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.out_w >= 1 && r.out_w <= 256 && r.out_h >= 1 && r.out_h <= 256))
    assert(out.forall(r => r.out_bytes <= r.n_bytes && r.out_bytes > 0))
  }

  test("frame sampling keeps every 4th 64-byte frame") {
    val out = Multimodal.sampleFramesAll(Multimodal.assets(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.n_sampled == (r.n_frames + 3) / 4)
      assert(r.sampled_bytes <= r.n_sampled * 64 && r.sampled_bytes > 0)
    }
  }
}
