package graft.core

import graft.SparkSpec

/** The round-15 advisor contract for driver-thread job overlap: tasks
  * submitted through [[JobOverlap]] run with the SUBMITTING thread's
  * scheduling identity (job group, FAIR pool, description), and clear
  * it afterwards — the global EC leaked whatever properties a pooled
  * thread inherited at creation, so overlapped sub-jobs escaped
  * job-group cancellation and could be cross-cancelled. */
class JobOverlapSpec extends SparkSpec {

  test("submitted body sees the submitter's scheduling properties") {
    val sc = spark.sparkContext
    sc.setJobGroup("jo-spec-group", "jo-spec-desc", interruptOnCancel = true)
    sc.setLocalProperty("spark.scheduler.pool", "jo-spec-pool")
    try {
      val seen = JobOverlap.await(JobOverlap.submit(sc)(
        (sc.getLocalProperty("spark.jobGroup.id"),
          sc.getLocalProperty("spark.scheduler.pool"))))
      assert(seen === ("jo-spec-group", "jo-spec-pool"))
    } finally {
      sc.setLocalProperty("spark.scheduler.pool", null)
      sc.clearJobGroup()
    }
  }

  test("properties are cleared on the pool thread after the task") {
    val sc = spark.sparkContext
    sc.setJobGroup("jo-spec-group-2", "first", interruptOnCancel = false)
    try JobOverlap.await(JobOverlap.submit(sc)(()))
    finally sc.clearJobGroup()
    // a submission from a clean thread must not see a stale group even
    // if the pool reuses the same thread
    val seen = JobOverlap.await(JobOverlap.submit(sc)(
      sc.getLocalProperty("spark.jobGroup.id")))
    assert(seen == null,
      s"pool thread leaked a stale job group: $seen")
  }

  test("overlapped Spark actions run and return results") {
    import spark.implicits._
    val f1 = JobOverlap.submit(spark.sparkContext)(
      Seq(1, 2, 3).toDF("x").agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0))
    val f2 = JobOverlap.submit(spark.sparkContext)(
      Seq(4L, 5L).toDF("x").count())
    assert(JobOverlap.await(f1) == 6L)
    assert(JobOverlap.await(f2) == 2L)
  }
}
