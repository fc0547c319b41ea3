package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TaxonomySpec extends SparkSpec {

  test("q184 report accounts for every document exactly once") {
    val docs = graft.core.Tables.documents(spark, sf)
    val report = Taxonomy.q184TopicTag(spark, sf)
    assert(report.agg(sum(col("n_docs"))).collect()(0).getLong(0) == docs.count())
    // topic domain is closed: the lexicon names plus 'none'
    val topics = report.select("topic").distinct().collect().map(_.getString(0)).toSet
    assert(topics.subsetOf(Taxonomy.Lexicons.map(_._1).toSet + "none"))
  }

  test("tagging is a pure function with first-listed-wins tie-break") {
    import spark.implicits._
    // hand-built corpus: a clean winner per topic, an exact tie between
    // the first two lexicons, and an all-miss document
    val docs = Seq(
      (1L, "srcA", "scan filter join zzz"),          // query wins 3-0-0
      (2L, "srcA", "table row zzz zzz"),             // storage wins 0-2-0
      (3L, "srcA", "fast slow zzz key"),             // perf wins 0-0-3
      (4L, "srcA", "scan table"),                    // 1-1-0 tie -> query (first listed)
      (5L, "srcA", "zzz yyy xxx"))                   // none
      .toDF("doc_id", "source", "text")
    val got = Taxonomy.tagged(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(1L) == ("query", 3L))
    assert(got(2L) == ("storage", 2L))
    assert(got(3L) == ("perf", 3L))
    assert(got(4L) == ("query", 1L), "ties must break to the first-listed lexicon")
    assert(got(5L) == ("none", 0L))
  }

  test("q206 counts overlapping phrase occurrences and keeps zero-hit phrases") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    Seq(
      (1L, "table hash table hash x", "en", "s", 0L),
      (2L, "hash table hash table hash", "en", "s", 0L), // 'table hash' twice, overlapping chain
      (3L, "nothing here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Taxonomy.q206PhraseTags(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("table hash") == ((2L, 4L)),
      "both docs hit; 2 + 2 overlapping-position occurrences")
    assert(got("big order") == ((0L, 0L)), "zero-hit phrases stay in the report")
    assert(got.size == Taxonomy.PhraseLexicon.size)
  }

  test("q184 is map-only up to the report aggregate: one shuffle plus the output sort") {
    val df = Taxonomy.q184TopicTag(spark, sf)
    df.collect()
    val shuffles = graft.layout.BucketedLayout
      .collectExchanges(df.queryExecution.executedPlan)
      .count(_.toLowerCase.contains("shuffle"))
    assert(shuffles <= 2, s"q184 runs $shuffles shuffles (expected ≤ 2 — report agg + sort)")
  }
}
