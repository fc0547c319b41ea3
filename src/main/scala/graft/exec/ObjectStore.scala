package graft.exec

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Object listing (SURVEY §2.1 S8): the `list_objects_v2` surface the
  * reference harness drives (`test_pipeline.py:43-59` checks the raw-data
  * tree, `:248-259` walks query results by prefix) — Spark-native via the
  * Hadoop FileSystem API, so the same code lists `file://` locally and
  * HDFS/object stores (`s3a://`, `abfss://`, …) on a cluster.
  *
  * Semantics mirror list_objects_v2: keys are `/`-separated paths
  * relative to the listing root, returned in lexicographic order,
  * filtered by prefix, paginated by `maxKeys` with a continuation token
  * (the last key of the page — StartAfter semantics). Listing is
  * metadata-only: no data is read, and a page never exceeds `maxKeys`
  * entries in driver memory.
  */
object ObjectStore {

  final case class ObjectSummary(key: String, size: Long, modifiedMs: Long)
  final case class Listing(objects: Seq[ObjectSummary], nextToken: Option[String])

  /** List objects under `root` whose relative key starts with `prefix`. */
  def list(
      spark: SparkSession,
      root: String,
      prefix: String = "",
      maxKeys: Int = 1000,
      continuationToken: Option[String] = None): Listing = {
    val rootPath = new HPath(root)
    val fs: FileSystem = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Listing(Nil, None)
    val rootUri = fs.makeQualified(rootPath).toUri.getPath.stripSuffix("/")

    val all = Seq.newBuilder[ObjectSummary]
    val it = fs.listFiles(rootPath, true)
    while (it.hasNext) {
      val st = it.next()
      val key = st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      if (key.startsWith(prefix))
        all += ObjectSummary(key, st.getLen, st.getModificationTime)
    }
    val sorted = all.result().sortBy(_.key)
    val after = continuationToken.getOrElse("")
    val page = sorted.iterator.filter(_.key > after).take(maxKeys).toSeq
    val more = page.nonEmpty && sorted.exists(_.key > page.last.key)
    Listing(page, if (more) Some(page.last.key) else None)
  }
}
