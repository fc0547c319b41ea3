package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import graft.sources.{ExtractJob, HttpJsonSource, RawData}

/** Post-deploy smoke check (reference `scripts/deploy_lambda.py:175-215`):
  * after a code update, re-invoke the extractor against the configured
  * landing root and assert the success envelope — 200 status, a non-zero
  * record count, AND the landed partition actually readable back through
  * the catalog-facing scan (one step stronger than the reference, which
  * only checks the response payload).
  *
  * The check is deliberately cheap and side-effect-shaped like a real
  * invocation (it writes one day-partition append, exactly what the
  * scheduled extract does) so it can run immediately after every deploy.
  */
object DeploySmoke {

  /** Smoke outcome: the raw envelope plus the read-back verification. */
  final case class Smoke(
      ok: Boolean, envelope: ExtractJob.Result, readBack: Long, detail: String)

  def run(
      spark: SparkSession,
      root: String,
      fetcher: HttpJsonSource.Fetcher = HttpJsonSource.httpFetcher(),
      url: String = ExtractJob.DefaultUrl): Smoke = {
    val res = ExtractJob.run(spark, root, fetcher, url)
    if (res.statusCode != 200)
      Smoke(ok = false, res, 0L,
        s"envelope ${res.statusCode}: ${res.error.getOrElse("(no error detail)")}")
    else if (res.recordsProcessed == 0L)
      Smoke(ok = false, res, 0L, "envelope 200 but zero records processed")
    else {
      // read back through the same scan the catalog serves; the root is
      // append-model so older partitions may add to the count
      val n = scala.util.Try(RawData.read(spark, root).count()).getOrElse(-1L)
      if (n >= res.recordsProcessed)
        Smoke(ok = true, res, n, s"ok: ${res.recordsProcessed} extracted, $n readable")
      else
        Smoke(ok = false, res, n,
          s"landed data not readable back: $n rows < ${res.recordsProcessed} extracted")
    }
  }

  /** Usage: runMain graft.jobs.DeploySmoke [root] [--live]
    * Exit code 0 on a passing smoke, 1 otherwise (deploy-script shape).
    * Without --live the built-in fixture body stands in for the HTTP
    * call, matching [[PipelineDemo]]. */
  def main(args: Array[String]): Unit = {
    val root = args.filterNot(_.startsWith("--")).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_smoke").toString + "/raw-data")
    val live = args.contains("--live")
    val spark = Sessions.local("graft-deploy-smoke", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val fetcher: HttpJsonSource.Fetcher =
      if (live) HttpJsonSource.httpFetcher() else _ => Right(PipelineDemo.FixtureBody)
    val smoke = run(spark, root, fetcher)
    println(s"[smoke] ${if (smoke.ok) "PASS" else "FAIL"} — ${smoke.detail}")
    spark.stop()
    if (!smoke.ok) sys.exit(1)
  }
}
