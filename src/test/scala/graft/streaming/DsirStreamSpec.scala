package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sampling

class DsirStreamSpec extends SparkSpec {

  test("streamed DSIR admission: positive weights only, and scores equal the batch path") {
    val out = DsirStream.q132StreamDsir(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.nonEmpty)
    assert(out.values.forall(_ > 0), "admission floor is dsir_micro > 0")
    // the stream's per-row array bigrams must equal the batch lead-window
    // bigrams: recompute every doc's weight from the batch feature frame
    // against the same model and compare where admitted
    val model = Sampling.dsirModel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Sampling.dsirFeatures(spark, sf)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)))
      .toMap
    val batchScore = batch.view.mapValues(
      _.map { case (b, c) => c * model.getOrElse(b, 0L) }.sum).toMap
    assert(out.keySet == batchScore.filter(_._2 > 0).keySet,
      "stream admits exactly the batch-positive docs")
    out.foreach { case (id, w) =>
      assert(batchScore(id) == w, s"doc $id stream weight $w != batch ${batchScore(id)}")
    }
  }

  test("streamed admission is drain-deterministic") {
    val a = DsirStream.q132StreamDsir(spark, sf).collect().map(_.toString).toSeq
    val b = DsirStream.q132StreamDsir(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
