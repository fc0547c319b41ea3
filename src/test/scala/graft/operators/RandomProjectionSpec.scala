package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {

  test("jl projection on unit axes reads the sign matrix back exactly") {
    import spark.implicits._
    // e_i projects to (sign(0·D+i), …, sign((k−1)·D+i)) — every output
    // coordinate is ±1, so the projection IS the sign matrix column
    val d = 8
    val axes = (0 until d).map(i =>
      (i.toLong, Array.tabulate(d)(j => if (j == i) 1.0f else 0.0f)))
    val out = axes.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        RandomProjection.jlProject(col("embedding"), RandomProjection.JlDim).as("p"))
      .collect()
    val signs = out.map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
    assert(signs.values.forall(_.forall(v => v == 1.0 || v == -1.0)))
    // the matrix must not be degenerate: both signs appear, and columns
    // differ (an alternating-low-bit LCG bug would make them periodic)
    val flat = signs.values.flatten.toSeq
    val plus = flat.count(_ == 1.0)
    assert(plus > flat.size / 4 && plus < 3 * flat.size / 4,
      s"sign matrix unbalanced: $plus of ${flat.size} positive")
    assert(signs(0L).toSeq != signs(1L).toSeq, "adjacent columns identical")
  }

  test("q217 distortion concentrates around the JL expectation") {
    val rows = RandomProjection.q217JlProjection(spark, sf).collect()
    assert(rows.nonEmpty)
    // pair set is exactly the even-consecutive grid
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 1 && r.getLong(0) % 2 == 0)
    }
    // E[d2_proj] = k · d2_orig for ±1 signs: the mean ratio over ~200
    // pairs concentrates hard around 1e6 (per-pair std ≈ √(2/k))
    val ratios = rows.map(_.getLong(4).toDouble)
    val mean = ratios.sum / ratios.length
    assert(mean > 600000 && mean < 1500000,
      s"mean distortion ratio $mean outside the JL band")
  }

  test("q219 stream sketches equal the batch projection row-for-row") {
    import graft.streaming.JlEncodeStream
    val streamed = JlEncodeStream.q219StreamJlEncode(spark, sf).collect()
      .map(_.toString).sorted
    val batch = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        RandomProjection.jlProject(col("embedding"), RandomProjection.JlDim).as("p"))
      .select(col("vec_id"), posexplode(col("p")).as(Seq("dim", "pv")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        floor(col("pv") * lit(1e6) + lit(0.5)).cast("long").as("proj_micro"))
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      "stream encode diverged from the batch projection")
  }
}
