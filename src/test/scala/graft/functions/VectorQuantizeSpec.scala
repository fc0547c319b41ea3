package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorQuantizeSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("UnitQuantize is bit-identical to the composable transform chain") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val nrm = sqrt(hofDot(col("embedding"), col("embedding")))
    val hof = transform(col("embedding"),
      x => graft.operators.KMeans.halfAway(
        lit(graft.operators.Similarity.DivQuant) * x.cast("double") / nrm))
    val diff = emb.select(
        VectorFunctions.unit_quantize(col("embedding"),
          graft.operators.Similarity.DivQuant).as("fast"),
        hof.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "codegen'd quantize must equal the interpreted chain")
  }

  test("DotProductLong is bit-identical to the interpreted fold") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val q = VectorFunctions.unit_quantize(col("embedding"),
      graft.operators.Similarity.DivQuant)
    val diff = emb.select(q.as("qv"))
      .select(
        VectorFunctions.dot_long(col("qv"), col("qv")).as("fast"),
        hofDot(col("qv"), col("qv")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "codegen'd dot must equal the interpreted fold")
  }

  test("zero-length and null inputs stay total") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[Float])),
      (2L, None: Option[Seq[Float]]),
      (3L, Some(Seq(3.0f, 4.0f))))
      .toDF("id", "embedding")
    val rows = df.select(col("id"),
        VectorFunctions.unit_quantize(col("embedding"), 1000.0).as("qv"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(2L).isEmpty, "NULL in, NULL out")
    assert(rows(1L).exists(_.asInstanceOf[scala.collection.Seq[_]].isEmpty))
    assert(rows(3L).exists(_.asInstanceOf[scala.collection.Seq[_]] ==
      Seq(600L, 800L)), "3-4-5 triangle quantizes to (600, 800) milli-units")
  }
}
