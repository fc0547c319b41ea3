package graft.operators

import graft.SparkSpec

class LangSegmentsSpec extends SparkSpec {

  test("windows score with the shared argmax and switches count adjacencies") {
    import spark.implicits._
    val W = LangSegments.SegWindowTokens
    // 3 windows: en-stopword window, all-miss window (ties to 'fr', the
    // lexicographically-last code), en window again -> 2 switches
    val text = (Seq.fill(W)("the") ++ Seq.fill(W)("zzz") ++ Seq.fill(W)("is"))
      .mkString(" ")
    val one = Seq((7L, text)).toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    // run the same pipeline body via a temp write? Simpler: score inline
    val got = LangSegments.q205CodeSwitchSegments(spark, writeDocs(one))
      .collect()(0)
    assert(got.getLong(1) == 3, "three full windows")
    assert(got.getLong(2) == 2, "en -> fr -> en is two switches")
    assert(got.getString(3) == "en", "two en windows dominate")
    assert(got.getLong(4) == 1000000L * 2 / 3)
  }

  private def writeDocs(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-langseg").toString
    df.select(
        df("doc_id"), df("text"),
        org.apache.spark.sql.functions.lit("en").as("lang"),
        df("source"),
        org.apache.spark.sql.functions.length(df("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("a window can never disagree with a same-tokened document (shared scorer)") {
    val docs = graft.core.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions._
    // documents at most one window long: dominant == doc-level langid
    val short = docs.filter(
      size(TextOps.tokens(col("text"))) <= LangSegments.SegWindowTokens &&
        size(TextOps.tokens(col("text"))) > 0)
    if (short.count() > 0) {
      val segs = LangSegments.q205CodeSwitchSegments(spark, sf)
        .select("doc_id", "dominant_lang")
      val diff = short.select(col("doc_id"),
          TextOps.languageId(col("text")).as("doc_lang"))
        .join(segs, Seq("doc_id"))
        .filter(col("doc_lang") =!= col("dominant_lang")).count()
      assert(diff == 0)
    }
  }

  test("q205 profile totals are internally consistent on the fixture") {
    val rows = LangSegments.q205CodeSwitchSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) - 1 || r.getLong(1) == 1,
        "switches are bounded by window adjacencies")
      assert(r.getLong(4) >= 1000000L / r.getLong(1),
        "the dominant language covers at least one window's share")
      assert(r.getLong(4) <= 1000000L)
    }
  }
}
