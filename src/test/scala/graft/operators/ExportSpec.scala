package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The export writer's contract: what lands is exactly what the q247
  * manifest promises, and ANY drift — a dropped record, a mangled text
  * byte, a misrouted shard, a missing shard directory — flips a
  * reconciliation boolean. The corruption tests run the reconciliation
  * at frame level (the same code q248 runs over the landed scan), plus
  * one disk-level test that really deletes a landed shard directory and
  * re-lands. */
class ExportSpec extends SparkSpec {

  private def q248rows() =
    Export.q248ExportVerify(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        r.getBoolean(9))
    }

  test("a clean landing reconciles fully against the manifest") {
    val rows = q248rows()
    assert(rows.nonEmpty, "no shards landed")
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.forall { case (_, n, a, b, c, d, e) =>
      n > 0 && a && b && c && d && e
    }, s"clean landing must match everywhere: ${rows.mkString(", ")}")
    // the landed record count equals the manifest's total
    val manifestTotal = Curation.q247TrainingExport(spark, sf)
      .agg(sum(col("n_records"))).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == manifestTotal)
  }

  test("a JSONL landing verifies through the same reconciliation (format option)") {
    // round-14 verdict item 7: trainers widely consume JSON lines; the
    // format is one conf and the q248 verification path is shared —
    // tokens/checksums recomputed from the landed text, never from a
    // serialized column, so the booleans gate the JSONL bytes too.
    spark.conf.set("spark.graft.export.format", "jsonl")
    try {
      val path = Export.landExport(spark, sf)
      assert(path.endsWith("data_jsonl"), s"jsonl landing dir: $path")
      // the landed files really are JSON lines: one parseable object per
      // line carrying the record columns
      val part = {
        def find(f: java.io.File): Option[java.io.File] =
          if (f.isFile && f.getName.endsWith(".json")) Some(f)
          else Option(f.listFiles()).toSeq.flatten.sortBy(_.getName)
            .flatMap(find).headOption
        find(new java.io.File(new java.net.URI(
          if (path.startsWith("file:")) path else "file://" + path)))
          .getOrElse(fail(s"no .json part files under $path"))
      }
      val first = java.nio.file.Files.readAllLines(part.toPath).get(0)
      assert(first.startsWith("{") && first.contains("\"doc_id\"") &&
        first.contains("\"text\""), s"not a JSONL record: $first")
      // q248 over the JSONL landing: every reconciliation verdict green
      val rows = q248rows()
      assert(rows.nonEmpty)
      assert(rows.forall { case (_, n, a, b, c, d, e) =>
        n > 0 && a && b && c && d && e
      }, s"jsonl landing must reconcile fully: ${rows.mkString(", ")}")
    } finally spark.conf.unset("spark.graft.export.format")
  }

  test("a dropped record flips records/tokens/checksum for its shard only") {
    val landed = spark.read.parquet(Export.landExport(spark, sf))
    val victim = landed.select("doc_id", "shard").orderBy("doc_id").limit(1)
      .collect()(0)
    val (vDoc, vShard) = (victim.getLong(0), victim.get(1).toString.toLong)
    val out = Export.reconcile(
      Export.readbackRollup(landed.filter(col("doc_id") =!= vDoc)),
      Curation.q247TrainingExport(spark, sf)).collect()
    out.foreach { r =>
      val hit = r.getLong(0) == vShard
      assert(r.getBoolean(5) == !hit, s"records_match shard ${r.getLong(0)}")
      assert(r.getBoolean(7) == !hit, s"weighted_match shard ${r.getLong(0)}")
      assert(r.getBoolean(8) == !hit, s"checksum_match shard ${r.getLong(0)}")
    }
  }

  test("a mangled text byte flips the checksum even with counts intact") {
    val landed = spark.read.parquet(Export.landExport(spark, sf))
    val victim = landed.select("doc_id", "shard").orderBy("doc_id").limit(1)
      .collect()(0)
    val (vDoc, vShard) = (victim.getLong(0), victim.get(1).toString.toLong)
    // same token count (one word swapped for one word), different bytes:
    // token/record counts still reconcile, the content checksum must not
    val mangled = landed.withColumn("text",
      when(col("doc_id") === vDoc,
        regexp_replace(col("text"), "^[^ ]+", "xqzzt")).otherwise(col("text")))
    val out = Export.reconcile(
      Export.readbackRollup(mangled),
      Curation.q247TrainingExport(spark, sf)).collect()
    val hitRow = out.find(_.getLong(0) == vShard).get
    assert(hitRow.getBoolean(5), "record count unchanged")
    assert(hitRow.getBoolean(6), "token count unchanged")
    assert(!hitRow.getBoolean(8), "checksum must catch the mangled byte")
  }

  test("a misrouted record flips the shard-draw verdict") {
    val landed = spark.read.parquet(Export.landExport(spark, sf))
    val victim = landed.select("doc_id", "shard").orderBy("doc_id").limit(1)
      .collect()(0)
    val (vDoc, vShard) = (victim.getLong(0), victim.get(1).toString.toLong)
    val wrongShard = (vShard + 1) % Sampling.ExportShards
    val misrouted = landed.withColumn("shard",
      when(col("doc_id") === vDoc, lit(wrongShard)).otherwise(col("shard")))
    val out = Export.reconcile(
      Export.readbackRollup(misrouted),
      Curation.q247TrainingExport(spark, sf)).collect()
    assert(!out.find(_.getLong(0) == wrongShard).get.getBoolean(9),
      "the receiving shard's draw verdict must flip")
  }

  test("a deleted shard directory surfaces as an all-false row, and re-landing heals") {
    val dataPath = Export.landExport(spark, sf)
    val shardDir = new java.io.File(dataPath.stripPrefix("file:"), "shard=0")
    assert(shardDir.exists(), s"expected landed shard dir at $shardDir")
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      f.delete()
    }
    rmrf(shardDir)
    try {
      val rows = q248rows()
      val r0 = rows.find(_._1 == 0L).get
      assert(r0._2 == 0L && !r0._3 && !r0._4 && !r0._5 && !r0._6,
        s"missing shard must reconcile all-false: $r0")
      assert(rows.filter(_._1 != 0L).forall(r => r._3 && r._4 && r._5 && r._6))
    } finally {
      // retire the corrupted version dir; the next landExport rebuilds
      rmrf(new java.io.File(shardDir.getParentFile.getParent))
    }
    assert(q248rows().forall { case (_, n, a, b, c, d, e) =>
      n > 0 && a && b && c && d && e
    }, "re-landing after eviction must reconcile clean")
  }
}
