package graft.core

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Cheap corpus-version signatures for JVM-cached, per-corpus artifacts
  * (IVF quantizers, dedup signature tables): (max modification time, file
  * count) over a table's files — a metadata listing, never a data read.
  *
  * Uses the Hadoop FileSystem API (same as [[graft.exec.ObjectStore]]) so
  * the signature works on every supported scheme (`file://`, `hdfs://`,
  * `s3a://`, …), not just bare local paths — a cache keyed on a signature
  * that silently returns a constant for remote paths would never
  * invalidate, which is exactly the stale-index bug this exists to stop.
  */
object TableVersion {

  /** Version signature of `dir/table` (a file or a directory tree). */
  def signature(spark: SparkSession, dir: String, table: String): String = {
    val p = new HPath(dir, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    var maxM = 0L
    var n = 0
    val it = fs.listFiles(p, /* recursive = */ true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) { maxM = math.max(maxM, st.getModificationTime); n += 1 }
    }
    s"$maxM-$n"
  }

  /** Full md5 hex digest for keying per-(corpus, version) artifact
    * directories and catalog identifiers. The earlier 31-bit
    * `hashCode`-based keys could collide across corpora/versions and
    * silently reuse or overwrite another corpus's materialization; a
    * 128-bit digest makes the key collision-free in practice (and stays
    * identifier-safe: lowercase hex). */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
