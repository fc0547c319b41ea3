package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkEntry

/** Diagnostic main: run one (or more) streaming queries with a
  * StreamingQueryListener attached and print every micro-batch progress
  * JSON — the per-batch breakdown (addBatch / getBatch / walCommit /
  * commitOffsets / state-store commit times) that tells checkpoint
  * overhead apart from state work. Used to attribute bench wall time
  * for the streaming family (round-9 verdict item 7); kept as a tool
  * because the question recurs every time a drain's timing moves.
  *
  * Usage: runMain graft.tools.StreamProbe <sfDir> <queryName> [more...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q77_stream_join")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // extra session confs: SPARK_GRAFT_CONF="k=v;k=v" (probe-only knob)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] started ${e.id} at ${e.timestamp}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[probe] progress ${e.progress.prettyJson}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] terminated ${e.id}")
    })
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name total ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
