package graft.streaming

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.TestGroupState

import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Flat-file corpus writer (the streaming source's pathGlobFilter
    * matches leaf FILES — a Spark-written directory feeds it nothing). */
  private def writeFlat(rows: Seq[(Long, String)], dir: java.nio.file.Path): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val df = rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val tmp = dir.resolve("_tmp").toString
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new HPath(dir.toString).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new HPath(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new HPath(dir.toString, "documents.parquet"))
    fs.delete(new HPath(tmp), true)
  }

  test("q114 gate: streamed screen equals the batch twin on the fixture corpus") {
    val row = DedupStream.q114StreamLshScreen(spark, sf).collect()
    assert(row.length == 1)
    assert(row(0).getBoolean(1), "stream_matches_batch")
    assert(row(0).getLong(0) > 0)
  }

  test("planted near-dups are flagged; unique docs are not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedupstream")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    writeFlat(Seq(
      10L -> base,
      11L -> (base + "lambda"),           // near-identical to 10 → same buckets
      12L -> base,                        // exact copy of 10
      20L -> ("one two three four five six seven eight nine ten " * 4),
      30L -> ("red orange yellow green blue indigo violet pink brown black " * 4)
    ), dir)
    val streamed = DedupStream.streamScreen(spark, dir.toString)
      .collect().map(_.getLong(0)).toSet
    val batch = DedupStream.batchScreen(spark, dir.toString)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch, "stream/batch twin equality")
    assert(streamed.contains(12L), "exact copy flagged against the lower id")
    assert(!streamed.contains(10L), "bucket minimum is the keeper")
    assert(!streamed.contains(20L) && !streamed.contains(30L), "unique docs unflagged")
  }

  test("screenGroup carries the bucket minimum across batches") {
    val s1 = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.empty[Long](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val b1 = DedupStream.screenGroupForTest(
      Iterator(5L, 9L).map(d => DedupStream.BucketRow(d, 0, 42L)), s1).toSeq
    assert(b1 == Seq(9L), "first batch flags all but the minimum")
    assert(s1.get == 5L)
    // second batch: ids above the carried minimum are flagged even though
    // the minimum-id doc is not in this batch
    val s2 = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.of(5L), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val b2 = DedupStream.screenGroupForTest(
      Iterator(12L, 17L).map(d => DedupStream.BucketRow(d, 0, 42L)), s2).toSeq
    assert(b2 == Seq(12L, 17L))
    assert(s2.get == 5L)
  }

  test("degenerate buckets poison and stay silent") {
    val s = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.empty[Long](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val big = (1L to (graft.operators.Dedup.MaxBucket + 1L))
      .iterator.map(d => DedupStream.BucketRow(d, 1, 7L))
    assert(DedupStream.screenGroupForTest(big, s).isEmpty, "oversized bucket emits nothing")
    assert(s.get == Long.MinValue, "bucket poisoned")
    val s2 = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.of(Long.MinValue), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    assert(DedupStream.screenGroupForTest(
      Iterator(DedupStream.BucketRow(3L, 1, 7L)), s2).isEmpty,
      "poisoned bucket stays silent in later batches")
  }
}
