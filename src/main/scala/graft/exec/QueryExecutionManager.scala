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

  /** Submit a SQL string; returns the execution id immediately. */
  def submit(sql: String): String = {
    val id = UUID.randomUUID().toString
    states.put(id, ExecutionState(id, sql, Status.Running, None))
    Future {
      try {
        val df = spark.sql(sql)
        writeArtifacts(id, sql, df)
        states.computeIfPresent(id, (_, s) =>
          if (s.status == Status.Cancelled) s else s.copy(status = Status.Succeeded))
      } catch {
        case e: Exception =>
          states.computeIfPresent(id, (_, s) =>
            if (s.status == Status.Cancelled) s
            else s.copy(status = Status.Failed, reason = Some(e.getMessage)))
      }
    }
    id
  }

  /** Status FSM — the `get_query_execution` shape. */
  def status(id: String): Option[ExecutionState] = Option(states.get(id))

  /** Best-effort cancel (the reference surfaces CANCELLED as a terminal
    * state; Spark-side job-group cancellation is cooperative). */
  def cancel(id: String): Boolean =
    states.computeIfPresent(id, (_, s) =>
      if (s.status == Status.Running) s.copy(status = Status.Cancelled) else s) != null

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

  /** `get_query_results` shape: header row + all cells stringified (the
    * VarCharValue model of `test_pipeline.py:181-198`; null → None). */
  def results(id: String): Option[(Seq[String], Seq[Seq[Option[String]]])] = {
    val dir = Paths.get(resultsDir, s"$id.csv")
    if (!Files.exists(dir)) None
    else {
      val df = spark.read.option("header", "true").csv(dir.toString)
      val header = df.schema.fieldNames.toSeq
      val rows = df.collect().toSeq.map(r =>
        header.indices.map(i => Option(r.get(i)).map(_.toString)))
      Some((header, rows))
    }
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
    val deleted = Files.list(root).iterator().asScala
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .toList
    deleted.foreach(deleteRecursively)
    deleted.map(_.getFileName.toString)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toList.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
