package graft.core

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.SparkContext

/** Driver-thread overlap of INDEPENDENT Spark jobs (guide §2.6: actions
  * are only sequential because driver code calls them sequentially; the
  * scheduler happily back-fills one job's stage tail with the next
  * job's tasks).
  *
  * Why not `ExecutionContext.Implicits.global` (round-15 advisor):
  * Spark local properties — job group, job description, FAIR scheduler
  * pool — live in an InheritableThreadLocal, so a POOLED thread keeps
  * whatever properties the thread that happened to create it had. Jobs
  * submitted from the global pool therefore (a) escape
  * [[graft.exec.QueryExecutionManager]]'s job-group cancellation and
  * per-workgroup FAIR pools, and (b) can be CROSS-CANCELLED when the
  * stale inherited group id belongs to some other query that gets
  * cancelled. [[submit]] fixes both by copying the scheduling-relevant
  * properties from the SUBMITTING thread onto the pool thread for the
  * duration of the task and clearing them in `finally` — the same
  * set/clear discipline `QueryExecutionManager.submit` applies to its
  * own worker threads.
  */
object JobOverlap {

  /** The local properties that carry a job's scheduling identity. */
  private val SchedulingProps = Seq(
    "spark.jobGroup.id",
    "spark.job.description",
    "spark.job.interruptOnCancel",
    "spark.scheduler.pool")

  // A cached pool, not a fixed one: submitted bodies BLOCK on Spark job
  // results, so a bounded pool could deadlock if overlaps nest (q200's
  // prod arm builds a store whose own build overlaps). Daemon threads,
  // reclaimed after 60 s idle — the pool never pins JVM shutdown.
  private lazy val ec: ExecutionContext = ExecutionContext.fromExecutorService(
    Executors.newCachedThreadPool { (r: Runnable) =>
      val t = new Thread(r, "graft-job-overlap")
      t.setDaemon(true)
      t
    })

  /** Run `body` on the overlap pool with the caller's scheduling
    * properties applied for its duration. */
  def submit[T](sc: SparkContext)(body: => T): Future[T] = {
    val props = SchedulingProps.map(k => k -> sc.getLocalProperty(k))
    Future {
      // setLocalProperty(k, null) removes the key, so absent props clear
      // whatever the pool thread inherited at creation
      props.foreach { case (k, v) => sc.setLocalProperty(k, v) }
      try body
      finally SchedulingProps.foreach(k => sc.setLocalProperty(k, null))
    }(ec)
  }

  /** Block for an overlapped result. */
  def await[T](f: Future[T]): T = Await.result(f, Duration.Inf)
}
