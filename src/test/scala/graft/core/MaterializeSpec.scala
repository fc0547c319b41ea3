package graft.core

import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSpec

/** Contract of the ONE materialization helper (round-15 verdict item 5):
  * the default mode is the eager localCheckpoint the operators measured
  * against; `reliable` routes through a real checkpoint dir (the 100 TB /
  * dynamic-allocation posture); `persist` keeps lineage. All three return
  * the same rows. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  test("default mode is an eager local checkpoint (scan-of-RDD plan)") {
    spark.conf.unset("spark.graft.materialize")
    val m = Materialize.once(frame)
    // a checkpointed frame plans as a scan over the materialized RDD —
    // no trace of the original subtree
    assert(executed(m).toString.contains("Scan ExistingRDD"))
    assert(m.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("persist mode keeps lineage and returns identical rows") {
    spark.conf.set("spark.graft.materialize", "persist")
    try {
      val m = Materialize.once(frame)
      assert(executed(m).toString.contains("InMemoryTableScan"))
      assert(m.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b", "c"))
      m.unpersist()
    } finally spark.conf.unset("spark.graft.materialize")
  }

  test("reliable mode checkpoints under spark.graft.checkpointDir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec").toString
    spark.conf.set("spark.graft.materialize", "reliable")
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val m = Materialize.once(frame)
      assert(m.orderBy("id").collect().length == 3)
      // the checkpoint actually landed in the configured dir
      val landed = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(landed > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset("spark.graft.materialize")
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }
}
