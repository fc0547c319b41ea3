package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("minhash-LSH pairs equal exact n-gram Jaccard pairs") {
    val exact = Dedup.q26NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.q27MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact,
      s"LSH (${lsh.size}) should match exact (${exact.size}) at these parameters")
  }

  test("simhash near-dup pairs cover the high-Jaccard planted pairs") {
    val exact = Dedup.q26NgramJaccard(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.q28Simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.9, s"simhash recall $recall over ${exact.size} planted pairs")
  }

  test("simhash pairs are truly similar (precision against jaccard)") {
    // every surfaced simhash pair should share a meaningful shingle overlap
    val simPairs = Dedup.q28Simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = graft.core.Tables.documents(spark, sf)
    val all = Dedup.jaccardPairs(docs, 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val bad = simPairs.filter(p => all.getOrElse(p, 0.0) < 0.3)
    assert(bad.size <= simPairs.size / 10,
      s"simhash false positives: ${bad.take(5)} of ${simPairs.size}")
  }

  test("q38 cluster labels are identical under the reliable-checkpoint flag") {
    // cluster posture (spark.graft.checkpointDir → real checkpoint) must
    // change only fault tolerance, never the labels
    val default = Dedup.q38DedupApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val cpDir = java.nio.file.Files.createTempDirectory("graft_cc_cp").toString
    spark.conf.set("spark.graft.checkpointDir", cpDir)
    try {
      val reliable = Dedup.q38DedupApply(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(reliable == default)
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("shingleArray produces k-grams and handles short docs") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f"), (2L, "a b")).toDF("doc_id", "text")
    val rows = df.select(org.apache.spark.sql.functions.col("doc_id"),
        Dedup.shingleArray(org.apache.spark.sql.functions.col("text"))).collect()
    val m = rows.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c d e", "b c d e f"))
    assert(m(2L) == Seq("a b")) // shorter than k: one truncated shingle
  }
}
