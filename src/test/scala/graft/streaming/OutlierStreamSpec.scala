package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Outlier

class OutlierStreamSpec extends SparkSpec {

  test("q195 streamed admission equals the batch audit minus its outliers") {
    val streamed = OutlierStream.q195StreamOutlierScreen(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val batch = Outlier.q192EmbeddingOutliers(spark, sf)
      .filter(!col("is_outlier"))
      .select("vec_id", "source", "centroid_cos_micro").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(streamed == batch,
      "ingest-time screening must equal the batch audit's admission")
    assert(streamed.nonEmpty)
    // something was actually screened out on the fixture
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(streamed.length < n, "the screen must drop the batch outliers")
    streamed.foreach { case (_, _, cc) =>
      assert(cc >= Outlier.OutlierTauMicro)
    }
  }
}
