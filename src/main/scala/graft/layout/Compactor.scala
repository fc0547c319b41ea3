package graft.layout

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** SMALL-FILES COMPACTION — the operational pass every long-running
  * ingest needs: streaming sinks and partitioned appends (the
  * reference's year/month/day layout, `data_extractor.py:73-85` via
  * `UserIngest.PartitionedCsvSink`, and every micro-batch drain in
  * `graft.streaming`) accrete files far below the HDFS/S3 sweet spot,
  * and at 100 TB the resulting per-file open/list overhead — and the
  * one-task-per-tiny-file scan parallelism — dominates read cost long
  * before bytes do. Compaction rewrites a directory into files near a
  * target size and swaps it in atomically.
  *
  * Design:
  *  - TARGET-SIZED, not fixed-count: output file count =
  *    ⌈bytes / targetBytes⌉ measured from the actual input listing, so
  *    the same entry point serves a 2 MB fixture directory and a 2 TB
  *    partition (the caller never guesses a partition count).
  *  - Coalesce-free: the rewrite uses `repartition(n)` (round-robin),
  *    not `coalesce(n)` — coalesce would collapse the READ parallelism
  *    of the very scan doing the rewrite, the classic compaction
  *    footgun at scale.
  *  - ATOMIC swap: rewrite lands in `<dir>.compact.tmp`, then a
  *    directory rename replaces the original (with the previous
  *    generation moved aside first, so a crash at any step leaves a
  *    complete directory on disk — the `VersionedStore` posture).
  *  - Row-identical by construction: one scan, no shuffle keys, no
  *    dedup — the spec proves multiset equality of rows before/after.
  *
  * At deployment scale each PARTITION compacts independently (the unit
  * of the rename swap matches the reference's partition layout); this
  * single-directory form is that unit. */
object Compactor {

  /** Bytes per output file the rewrite aims for. 128 MB default — the
    * common HDFS-block / S3-range sweet spot. */
  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  /** Listing of compactable data files under `dir` (non-hidden,
    * non-metadata). */
  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".") && f.getName.endsWith(".parquet"))
      .toSeq

  /** Compaction report: what a run did (or why it skipped). */
  final case class Report(
      dir: String,
      filesBefore: Int,
      bytesBefore: Long,
      filesAfter: Int,
      compacted: Boolean)

  /** Compact the parquet directory `dir` toward `targetBytes` files.
    * No-op (reported, not silent) when the directory already has at
    * most the target file count — rewriting well-laid-out data would
    * just churn the object store.
    *
    * SCOPE: local-filesystem directories only. The swap below relies
    * on `File.renameTo`, which is atomic-per-rename on a local POSIX
    * FS but does not exist as an operation on S3 (and crosses to a
    * copy on HDFS via this API) — an object-store deployment would
    * swap via a manifest/pointer flip (Iceberg/Delta-style commit)
    * instead, with the same read-clone-swap shape. The crash window
    * between the two renames (live dir absent, data complete under
    * `.compact.old`) is recovered on the next call, below. */
  def compact(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = DefaultTargetBytes): Report = {
    val d = new java.io.File(dir)
    // crash recovery: a failure between rename(d -> old) and
    // rename(tmp -> d) leaves NO live directory but a complete copy
    // under .compact.old — restore it before anything else so a
    // crashed compaction self-heals instead of stranding the data
    locally {
      val old = new java.io.File(d.getParentFile, d.getName + ".compact.old")
      if (!d.isDirectory && old.isDirectory)
        require(old.renameTo(d), s"crash recovery failed: $old -> $dir")
    }
    require(d.isDirectory, s"not a directory: $dir")
    val files = dataFiles(d)
    val bytes = files.map(_.length()).sum
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (files.size <= want)
      return Report(dir, files.size, bytes, files.size, compacted = false)
    val tmp = new java.io.File(d.getParentFile, d.getName + ".compact.tmp")
    val old = new java.io.File(d.getParentFile, d.getName + ".compact.old")
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    spark.read.parquet(dir)
      .repartition(want)
      .write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    // swap: current -> .old, tmp -> current, drop .old. A crash between
    // the renames leaves a complete directory under one of the names.
    require(d.renameTo(old), s"swap failed: $dir -> $old")
    require(tmp.renameTo(d), s"swap failed: $tmp -> $dir")
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    Report(dir, files.size, bytes, dataFiles(d).size, compacted = true)
  }

  /** The compaction decision for every leaf partition directory under
    * `root` (directories that directly contain parquet files) — the
    * scan a nightly compaction job runs over a partitioned table.
    * Returns (partition, files, bytes, wouldCompact) WITHOUT rewriting;
    * callers then `compact()` the flagged leaves. */
  def survey(spark: SparkSession, root: String,
      targetBytes: Long = DefaultTargetBytes): DataFrame = {
    import spark.implicits._
    def leaves(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
      val dirs = kids.filter(_.isDirectory).toSeq
      val here = if (dataFiles(f).nonEmpty) Seq(f) else Seq.empty
      here ++ dirs.flatMap(leaves)
    }
    leaves(new java.io.File(root)).map { leaf =>
      val fs = dataFiles(leaf)
      val bytes = fs.map(_.length()).sum
      val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      (leaf.getPath, fs.size.toLong, bytes, fs.size > want)
    }.toDF("partition", "n_files", "bytes", "would_compact")
      .orderBy("partition")
  }
}
