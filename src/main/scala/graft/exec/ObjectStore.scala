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
  * metadata-only and bounded: directories that cannot contain the prefix
  * are never descended, and page selection keeps only the `maxKeys`
  * smallest qualifying keys in a heap — O(maxKeys) driver memory however
  * large the tree is.
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
    if (maxKeys <= 0) return Listing(Nil, None)
    val rootPath = new HPath(root)
    val fs: FileSystem = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Listing(Nil, None)
    val rootUri = fs.makeQualified(rootPath).toUri.getPath.stripSuffix("/")
    val after = continuationToken.getOrElse("")

    // bounded page selection: max-heap of the maxKeys smallest keys
    // strictly after the token; anything evicted or rejected while the
    // heap is full proves a further page exists
    val heap = scala.collection.mutable.PriorityQueue.empty[ObjectSummary](
      Ordering.by((o: ObjectSummary) => o.key))
    var beyondPage = false

    def relKey(p: HPath): String =
      p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")

    def walk(dir: HPath): Unit =
      fs.listStatus(dir).foreach { st =>
        val key = relKey(st.getPath)
        if (st.isDirectory) {
          // descend only when the subtree can hold matching keys: the
          // dir is an ancestor of the prefix or lies inside it, AND its
          // key range can still contain keys past the continuation token
          // (every key under dirKey is <= dirKey + U+FFFF-padding, so a
          // dir whose upper bound sorts <= the token is a skip — without
          // this, each page re-walks the whole tree and a full pagination
          // costs O(N^2/maxKeys) listStatus calls)
          val dirKey = key + "/"
          val matchesPrefix = prefix.startsWith(dirKey) || dirKey.startsWith(prefix)
          if (matchesPrefix && (dirKey + "\uFFFF") > after)
            walk(st.getPath)
        } else if (key.startsWith(prefix) && key > after) {
          if (heap.size < maxKeys)
            heap.enqueue(ObjectSummary(key, st.getLen, st.getModificationTime))
          else if (key < heap.head.key) {
            heap.dequeue()
            heap.enqueue(ObjectSummary(key, st.getLen, st.getModificationTime))
            beyondPage = true
          } else beyondPage = true
        }
      }

    walk(rootPath)
    val page = heap.toSeq.sortBy(_.key)
    Listing(page, if (beyondPage && page.nonEmpty) Some(page.last.key) else None)
  }
}
