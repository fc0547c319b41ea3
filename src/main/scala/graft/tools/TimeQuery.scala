package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: wall-clock one or more queries in a warmed session —
  * three runs each, median reported (the Bench measurement shape
  * without the full sweep).
  *
  *   sbt "runMain graft.tools.TimeQuery <sfDir> <queryName> [...]"
  */
object TimeQuery {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_TIME_REPS (dev-only): more reps = steadier min on a
    // box with JIT/GC jitter; default keeps the historical 3
    val reps = scala.util.Try(sys.env("SPARK_GRAFT_TIME_REPS").trim.toInt)
      .toOption.getOrElse(3).max(2)
    names.foreach { name =>
      val fn = ScaleBench.ProdPaths.getOrElse(name, graft.SparkEntry.queries(name))
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median for even sizes (round-15 advisor): the upper-middle
      // sample alone reports the MAX as "median" at reps=2
      val median =
        if (samples.size % 2 == 1) samples(samples.size / 2)
        else (samples(samples.size / 2 - 1) + samples(samples.size / 2)) / 2.0
      println(f"[timequery] $name: median $median%.3f s " +
        f"(min ${samples.head}%.3f, max ${samples.last}%.3f)")
    }
    spark.stop()
  }
}
