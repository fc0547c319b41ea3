package graft

import org.apache.spark.sql.functions._

/** Throwaway measurement probe (deleted before commit). */
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"== $sf ==")
      val docs = graft.core.Tables.documents(spark, sf)
      // deflate ratio bounds + correlation with distinct-token ratio
      val toks = graft.operators.TextOps.tokens(col("text"))
      val d = docs.select(
        graft.functions.VectorFunctions.deflate_ratio(col("text")).as("r"),
        (size(array_distinct(toks)).cast("double") /
          greatest(size(toks), lit(1))).as("dtr"))
      d.agg(min("r"), max("r"), corr("r", "dtr"), count(lit(1))).show(false)
      // simhash vs exact jaccard
      val sim = graft.operators.Dedup.q28Simhash(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = graft.operators.Dedup.q26NgramJaccard(spark, sf).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      val hi = exact.filter(_._2 >= 0.9).map(_._1).toSet
      val all06 = exact.map(_._1).toSet
      println(s"sim pairs=${sim.size} exact09=${hi.size} exact06=${all06.size}")
      println(s"recall@0.9=${hi.count(sim.contains).toDouble / hi.size}")
      println(s"recall@0.6=${all06.count(sim.contains).toDouble / all06.size}")
      println(s"sim∩exact06 precision=${sim.count(all06.contains).toDouble / sim.size}")
      // semdedup stats
      val emb = graft.core.Tables.embeddings(spark, sf)
      val out = graft.operators.Similarity.q69SemDedup(spark, sf).collect()
      val dropped = out.filter(_.getString(2) == "drop").map(_.getLong(0)).toSet
      val pairs = graft.operators.Similarity.q31CosineNearDup(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val dupVecs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      println(s"n=${emb.count()} dropped=${dropped.size} exactDupVecs=${dupVecs.size} " +
        s"dropsSubset=${dropped.subsetOf(dupVecs)}")
    }
    spark.stop()
  }
}
