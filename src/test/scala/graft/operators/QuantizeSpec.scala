package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.layout.BucketedLayout

class QuantizeSpec extends SparkSpec {

  test("q88: RMS error is bounded by the quantization step") {
    val rows = Quantize.q88QuantizeError(spark, sf).collect()
    assert(rows.length == 10) // one per label
    rows.foreach { r =>
      val maxScale = r.getDouble(4)
      val rms = r.getDouble(5)
      // per-element error of a mid-rise quantizer is ≤ step/2
      assert(rms > 0 && rms <= maxScale / 2 + 1e-9,
        s"label ${r.get(0)}: rms $rms vs step ${maxScale}")
    }
  }

  test("vectors that sit exactly on the int8 grid reconstruct with ~zero error") {
    import spark.implicits._
    // scale = 1.0/127 ⇒ grid points k/127; errors only from float storage
    val grid = Seq(
      (1L, Array(1.0f / 127, -5.0f / 127, 1.0f, -1.0f, 0.0f)),
      (2L, Array(100.0f / 127, -100.0f / 127, 1.0f, 0.5f / 127 * 2, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.int8Error(grid, col("embedding")).collect()
    out.foreach { r =>
      val sumE2 = r.getLong(r.fieldIndex("sum_e2"))
      // float32 storage of k/127 is within 1e-7 of exact ⇒ micro ≤ ~200
      assert(sumE2 < 5 * 200L * 200L, s"grid vector error too large: $sumE2")
    }
  }

  test("q88 plan: one embeddings scan, label-grain shuffle only") {
    val df = Quantize.q88QuantizeError(spark, sf)
    df.collect()
    val n = BucketedLayout.collectExchanges(df.queryExecution.executedPlan)
      .count(_.toLowerCase.contains("shuffle"))
    assert(n <= 2, s"q88 runs $n shuffles (expected ≤ 2: label agg + sort)")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(raw"\(\d+\) Scan parquet".r.findAllIn(plan).length == 1,
      s"q88 must scan embeddings once\n$plan")
  }

  test("q95 norm audit: exact integer bounds bracket the mean, no zero vectors") {
    val rows = Quantize.q95NormAudit(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).sum == 500)
    rows.foreach { r =>
      assert(r.getLong(2) == 0, "fixture has no zero vectors")
      val (lo, hi) = (r.getLong(4), r.getLong(5))
      val avg = r.getDouble(6)
      assert(lo <= hi)
      assert(avg * 1e9 >= lo - 1 && avg * 1e9 <= hi + 1,
        s"label ${r.get(0)}: avg $avg outside [$lo, $hi] nano")
    }
  }
}
