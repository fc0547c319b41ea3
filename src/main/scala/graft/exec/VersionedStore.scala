package graft.exec

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Versioned object writes with noncurrent-version expiry — the engine
  * analogue of the reference's versioned data bucket and its 30-day
  * `noncurrent_version_expiration` lifecycle rule
  * (`data_pipeline/data_pipeline_stack.py:24-37`): an overwrite never
  * destroys the previous object; superseded versions survive for the
  * retention window and are then reaped.
  *
  * Layout (Hadoop FS, so the same code runs on `file://`/HDFS/object
  * stores): `root/<key>` is the current version; superseded versions are
  * archived as `root/.versions/<key>/<epochMs>`. The archive step is a
  * RENAME — metadata-only on hierarchical stores, never a data copy.
  * [[expireNoncurrent]] is the lifecycle rule as an explicit job (same
  * posture as [[Retention.cleanup]] for the 7-day results rule), keyed on
  * archive time so a version's clock starts when it becomes noncurrent,
  * exactly like S3's rule. */
object VersionedStore {

  private def fs(spark: SparkSession, p: HPath): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsDir(root: String, key: String): HPath =
    new HPath(new HPath(root, ".versions"), key)

  /** Write `key` under `root`, archiving any existing current version. */
  def put(spark: SparkSession, root: String, key: String, content: String): Unit = {
    require(!key.startsWith(".versions"), "reserved prefix: .versions")
    val cur = new HPath(root, key)
    val f = fs(spark, cur)
    if (f.exists(cur)) {
      val dir = versionsDir(root, key)
      f.mkdirs(dir)
      // archive stamp = supersession time (starts the noncurrent clock);
      // bump on collision so two overwrites in one millisecond can't
      // silently drop a version
      var stamp = System.currentTimeMillis()
      while (f.exists(new HPath(dir, stamp.toString))) stamp += 1
      f.rename(cur, new HPath(dir, stamp.toString))
    }
    val out = f.create(cur, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Current content of `key`, if present. */
  def get(spark: SparkSession, root: String, key: String): Option[String] = {
    val cur = new HPath(root, key)
    val f = fs(spark, cur)
    if (!f.exists(cur)) None
    else {
      val in = f.open(cur)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8)) finally in.close()
    }
  }

  /** Noncurrent version stamps for `key`, newest first. */
  def noncurrentVersions(spark: SparkSession, root: String, key: String): Seq[Long] = {
    val dir = versionsDir(root, key)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption)
      .sorted(Ordering[Long].reverse)
  }

  /** The lifecycle rule: delete noncurrent versions archived more than
    * `maxAgeDays` ago, across every key under `root`. Returns the deleted
    * `<key>/<stamp>` identifiers. Metadata-only listing; bounded by the
    * number of noncurrent versions, never by data size. */
  def expireNoncurrent(
      spark: SparkSession,
      root: String,
      maxAgeDays: Int = 30,
      now: Long = System.currentTimeMillis()): Seq[String] = {
    val base = new HPath(root, ".versions")
    val f = fs(spark, base)
    if (!f.exists(base)) return Nil
    val cutoff = now - maxAgeDays.toLong * 24 * 3600 * 1000
    val deleted = Seq.newBuilder[String]
    val keys = f.listStatus(base)
    keys.foreach { keyDir =>
      f.listStatus(keyDir.getPath).foreach { v =>
        v.getPath.getName.toLongOption.foreach { stamp =>
          if (stamp < cutoff && f.delete(v.getPath, false))
            deleted += s"${keyDir.getPath.getName}/$stamp"
        }
      }
      // drop emptied key dirs so the archive doesn't accrete tombstones
      if (f.listStatus(keyDir.getPath).isEmpty) f.delete(keyDir.getPath, false)
    }
    deleted.result()
  }
}
