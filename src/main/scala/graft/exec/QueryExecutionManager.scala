package graft.exec

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.{ExecutionContext, Future}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-execution lifecycle manager (SURVEY §3.3): reproduces the
  * observable Athena API the reference drives —
  * `start_query_execution → QueryExecutionId`, poll
  * `get_query_execution` for {RUNNING, SUCCEEDED, FAILED(reason),
  * CANCELLED}, `get_query_results` as header + stringified cells, and a
  * per-execution `<id>.csv` + `<id>.csv.metadata` artifact pair
  * (reference `test_pipeline.py:144-233`).
  *
  * Internally there is no polling: submission is a driver-side Future and
  * Spark executes the plan; the poll-shaped API exists for parity with
  * the reference's clients. Results are materialized through the engine
  * (collect) ONLY for the stringified-results call — the CSV artifact is
  * written distributed then coalesced, so a big result never transits the
  * driver as rows.
  */
final class QueryExecutionManager(spark: SparkSession, resultsDir: String)(
    implicit ec: ExecutionContext) {

  import QueryExecutionManager._

  private val states = new ConcurrentHashMap[String, ExecutionState]()

  Files.createDirectories(Paths.get(resultsDir))

  /** Submit a SQL string; returns the execution id immediately. Every
    * Spark job the execution launches is tagged with the execution id as
    * its job group, so [[cancel]] can actually stop the work — the
    * observable semantics of Athena's `stop_query_execution`
    * (`test_pipeline.py:169-217`), not just a status flip. */
  def submit(sql: String): String = {
    val id = UUID.randomUUID().toString
    states.put(id, ExecutionState(id, sql, Status.Running, None))
    Future {
      // job group is thread-local on the SparkContext: set it on the
      // executing thread so all actions below inherit it
      spark.sparkContext.setJobGroup(id, s"graft query $id", interruptOnCancel = true)
      try {
        val df = spark.sql(sql)
        if (Option(states.get(id)).forall(_.status == Status.Running))
          writeArtifacts(id, sql, df)
        states.computeIfPresent(id, (_, s) =>
          if (s.status == Status.Cancelled) s else s.copy(status = Status.Succeeded))
      } catch {
        case e: Exception =>
          states.computeIfPresent(id, (_, s) =>
            if (s.status == Status.Cancelled) s
            else s.copy(status = Status.Failed, reason = Some(e.getMessage)))
      } finally {
        spark.sparkContext.clearJobGroup()
        // a cancel that interrupted a running write leaves partial
        // artifacts — a cancelled execution must not surface results
        if (Option(states.get(id)).exists(_.status == Status.Cancelled))
          deleteArtifacts(id)
      }
    }
    id
  }

  /** Status FSM — the `get_query_execution` shape. */
  def status(id: String): Option[ExecutionState] = Option(states.get(id))

  /** All known executions (the `list_query_executions` surface; teardown
    * uses it to stop in-flight work before purging artifacts). */
  def list(): Seq[ExecutionState] = states.values().asScala.toSeq

  /** Cancel: transitions RUNNING → CANCELLED and stops the underlying
    * Spark jobs via their job group (cooperative + task interrupt).
    * Returns whether the state actually transitioned — cancelling an
    * already-finished (or unknown) execution is a no-op and reports
    * false, matching the reference's terminal-state semantics. */
  def cancel(id: String): Boolean = {
    var transitioned = false
    states.computeIfPresent(id, (_, s) =>
      if (s.status == Status.Running) { transitioned = true; s.copy(status = Status.Cancelled) }
      else s)
    if (transitioned) spark.sparkContext.cancelJobGroup(id)
    transitioned
  }

  /** Blocking helper for clients that want the poll loop collapsed. */
  def await(id: String, timeoutMs: Long = 60000L): ExecutionState = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var st = states.get(id)
    while (st != null && st.status == Status.Running && System.currentTimeMillis() < deadline) {
      Thread.sleep(50L)
      st = states.get(id)
    }
    st
  }

  /** One page of `get_query_results`: header + stringified cells (the
    * VarCharValue model of `test_pipeline.py:181-198`; null → None) +
    * a continuation token. Athena pages at 1000 rows (the reference's
    * client walks NextToken); here the page is computed with
    * `offset/limit` over the on-disk artifact, so the driver only ever
    * holds one page of rows — a full-result `collect` at 100 TB is a
    * driver OOM, paging is the scale-safe surface. */
  def resultsPage(id: String, maxRows: Int = 1000, pageToken: Option[String] = None)
      : Option[ResultPage] = {
    val dir = Paths.get(resultsDir, s"$id.csv")
    // malformed/negative tokens are invalid requests, not crashes —
    // the surface this models rejects them; None is our analogue
    val start = pageToken match {
      case None => 0
      case Some(t) => t.toIntOption.filter(_ >= 0).getOrElse(-1)
    }
    if (!Files.exists(dir) || maxRows <= 0 || start < 0) None
    else {
      val df = spark.read.option("header", "true").csv(dir.toString)
      val header = df.schema.fieldNames.toSeq
      val rows = df.offset(start).limit(maxRows).collect().toSeq.map(r =>
        header.indices.map(i => Option(r.get(i)).map(_.toString)))
      val next = if (rows.size < maxRows) None else Some((start + maxRows).toString)
      Some(ResultPage(header, rows, next))
    }
  }

  /** Convenience full-result walk over [[resultsPage]] — test/demo scale
    * only (the paged API is the production surface). */
  def results(id: String): Option[(Seq[String], Seq[Seq[Option[String]]])] =
    resultsPage(id).map { first =>
      val rows = Seq.newBuilder[Seq[Option[String]]]
      var page: Option[ResultPage] = Some(first)
      while (page.isDefined) {
        rows ++= page.get.rows
        page = page.get.nextToken.flatMap(t => resultsPage(id, pageToken = Some(t)))
      }
      (first.header, rows.result())
    }

  private def deleteArtifacts(id: String): Unit = {
    Retention.deleteRecursively(Paths.get(resultsDir, s"$id.csv"))
    Files.deleteIfExists(Paths.get(resultsDir, s"$id.csv.metadata"))
  }

  private def writeArtifacts(id: String, sql: String, df: DataFrame): Unit = {
    val target = Paths.get(resultsDir, s"$id.csv").toString
    val n = df.cache().count()
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(target)
    df.unpersist()
    val schemaJson = df.schema.json
    val meta =
      s"""{"executionId":"$id","rowCount":$n,
         |"query":${jsonString(sql)},
         |"schema":$schemaJson,
         |"completedAt":"${java.time.Instant.now()}"}""".stripMargin
    Files.writeString(Paths.get(resultsDir, s"$id.csv.metadata"), meta)
  }
}

object QueryExecutionManager {

  sealed abstract class Status(val name: String)
  object Status {
    case object Running extends Status("RUNNING")
    case object Succeeded extends Status("SUCCEEDED")
    case object Failed extends Status("FAILED")
    case object Cancelled extends Status("CANCELLED")
  }

  final case class ExecutionState(
      id: String, sql: String, status: Status, reason: Option[String])

  /** One `get_query_results` page: header, stringified cells, and the
    * continuation token for the next page (None on the last page). */
  final case class ResultPage(
      header: Seq[String],
      rows: Seq[Seq[Option[String]]],
      nextToken: Option[String])

  private[exec] def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

/** Retention job (SURVEY §2.1 S7 TTL): the S3 lifecycle rule
  * (`data_pipeline_stack.py:44-51`, 7-day expiry on query results) as an
  * explicit cleanup pass. */
object Retention {

  def cleanup(resultsDir: String, maxAgeDays: Int = 7,
      now: Long = System.currentTimeMillis()): Seq[String] = {
    val root = Paths.get(resultsDir)
    if (!Files.exists(root)) return Nil
    val cutoff = now - maxAgeDays.toLong * 24 * 3600 * 1000
    val deleted = {
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .toList
      finally s.close()
    }
    deleted.foreach(deleteRecursively)
    deleted.map(_.getFileName.toString)
  }

  private[exec] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = {
        val s = Files.list(p)
        try s.iterator().asScala.toList finally s.close()
      }
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }
}
