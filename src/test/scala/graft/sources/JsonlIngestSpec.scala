package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JsonlIngestSpec extends SparkSpec {

  test("corrupt lines are quarantined, never lost or silently parsed") {
    // cache first: Spark refuses corrupt-column-only queries on raw JSON
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val df = JsonlIngest.read(spark, sf).cache()
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(df.count() == total, "every written line surfaces as a row")
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
    val expected = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") % JsonlIngest.CorruptMod === JsonlIngest.CorruptRem)
      .count()
    assert(corrupt.count() == expected)
    // quarantined rows parse no fields; valid rows parse all of them
    assert(corrupt.filter(col("doc_id").isNotNull).count() == 0)
    val valid = df.filter(col("_corrupt_record").isNull)
    assert(valid.filter(col("doc_id").isNull || col("text").isNull).count() == 0)
    // valid rows round-trip the parquet truth exactly
    val got = valid.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") % JsonlIngest.CorruptMod =!= JsonlIngest.CorruptRem)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    df.unpersist()
  }

  test("q107 report accounts for every line (valid + corrupt = written)") {
    val rows = JsonlIngest.q107JsonlIngest(spark, sf).collect()
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.exists(_.getString(0) == "_corrupt"))
  }

  test("q108 streaming ingest drain equals the batch report exactly") {
    val streamed = graft.streaming.IngestStream
      .q108StreamJsonlIngest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = JsonlIngest.q107JsonlIngest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
