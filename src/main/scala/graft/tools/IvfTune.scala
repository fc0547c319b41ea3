package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-probe IVF recall diagnostics (delete or keep as a
  * tuning tool). */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = graft.operators.Similarity.q29CosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val ivf = graft.operators.Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    exact.toSeq.sortBy(_._1).foreach { case (p, pairs) =>
      val got = ivf.getOrElse(p, Array.empty).map(_._2).toSet
      val hits = pairs.map(_._2).count(got.contains)
      println(s"probe $p: $hits/${pairs.length} got=${got.toSeq.sorted.mkString(",")}")
    }
    val centers = graft.operators.IvfIndex.centroids(
      spark, sf, graft.operators.Similarity.NumLists)
    println(s"nlist=${centers.length}")
    // cell population histogram
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf)
    val sizes = emb.select(explode(graft.functions.VectorFunctions.nearest_centroids(
        col("embedding"), centers, graft.operators.Similarity.SpillAssign)).as("l"))
      .groupBy("l").count().orderBy(desc("count")).collect()
    println("top cells: " + sizes.take(10).map(r => r.getLong(1)).mkString(","))
    println("cells used: " + sizes.length)
    spark.stop()
  }
}
