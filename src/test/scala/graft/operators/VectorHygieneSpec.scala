package graft.operators

import graft.SparkSpec

class VectorHygieneSpec extends SparkSpec {

  test("q212 flags nulls, zero norms, non-finite components and dim drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hygiene").toString
    Seq(
      (1L, Some(Seq(3.0f, 4.0f)), 0),            // healthy, norm 5.000
      (2L, Some(Seq(0.0f, 0.0f)), 0),            // zero norm
      (3L, Some(Seq(Float.NaN, 1.0f)), 0),       // non-finite
      (4L, None: Option[Seq[Float]], 0),         // null embedding
      (5L, Some(Seq(1.0f, 0.0f, 0.0f)), 0))      // dim drift
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val r = Outlier.q212VectorHygiene(spark, dir).collect()(0)
    def f(n: String) = r.getLong(r.fieldIndex(n))
    assert(f("n_rows") == 5 && f("n_null") == 1)
    assert(f("n_zero_norm") == 1)
    assert(f("n_nonfinite") == 1)
    assert(f("min_dim") == 2 && f("max_dim") == 3)
    assert(!r.getBoolean(r.fieldIndex("dims_consistent")))
    assert(f("max_norm_milli") == 5000L, "3-4-5 vector has norm 5.000")
  }

  test("q212 on the fixture corpus is all-healthy") {
    val r = Outlier.q212VectorHygiene(spark, sf).collect()(0)
    def f(n: String) = r.getLong(r.fieldIndex(n))
    assert(f("n_null") == 0 && f("n_zero_norm") == 0 && f("n_nonfinite") == 0)
    assert(r.getBoolean(r.fieldIndex("dims_consistent")))
    assert(f("avg_norm_milli") > 0)
  }
}
