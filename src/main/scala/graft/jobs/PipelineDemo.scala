package graft.jobs

import scala.concurrent.ExecutionContext.Implicits.global

import graft.core.Sessions
import graft.catalog.TableRegistry
import graft.exec.QueryExecutionManager
import graft.sources.{ExtractJob, HttpJsonSource}

/** End-to-end pipeline harness: the Spark-native equivalent of the
  * reference's `test_pipeline.py:330-438` five-stage run —
  * (1) extract, (2) verify data files, (3) crawl/catalog, (4) verify
  * table, (5) run the three canonical queries (`test_pipeline.py:113-132`)
  * through the execution manager and print results.
  *
  * Usage: runMain graft.jobs.PipelineDemo [workDir] [--live]
  * Without --live a built-in fixture body stands in for the HTTP call
  * (this container has no egress); with --live it GETs JSONPlaceholder
  * exactly like `data_extractor.py:31`.
  */
object PipelineDemo {

  val FixtureBody: String =
    """[
      |{"id":1,"name":"Leanne Graham","username":"Bret","email":"Sincere@april.biz",
      | "address":{"street":"Kulas Light","suite":"Apt. 556","city":"Gwenborough",
      |  "zipcode":"92998-3874","geo":{"lat":"-37.3159","lng":"81.1496"}},
      | "phone":"1-770-736-8031 x56442","website":"hildegard.org",
      | "company":{"name":"Romaguera-Crona","catchPhrase":"Multi-layered client-server neural-net","bs":"harness real-time e-markets"}},
      |{"id":2,"name":"Ervin Howell","username":"Antonette","email":"Shanna@melissa.tv",
      | "address":{"street":"Victor Plains","suite":"Suite 879","city":"Wisokyburgh",
      |  "zipcode":"90566-7771","geo":{"lat":"-43.9509","lng":"-34.4618"}},
      | "phone":"010-692-6593 x09125","website":"anastasia.net",
      | "company":{"name":"Deckow-Crist","catchPhrase":"Proactive didactic contingency","bs":"synergize scalable supply-chains"}},
      |{"id":3,"name":"Clementine Bauch","username":"Samantha","email":"Nathan@yesenia.net",
      | "address":{"street":"Douglas Extension","suite":"Suite 847","city":"Wisokyburgh",
      |  "zipcode":"59590-4157","geo":{"lat":"-68.6102","lng":"-47.0653"}},
      | "phone":"1-463-123-4447","website":"ramiro.info",
      | "company":{"name":"Romaguera-Jacobson","catchPhrase":"Face to face bifurcated interface","bs":"e-enable strategic applications"}}
      |]""".stripMargin

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString)
    val live = args.contains("--live")
    val spark = Sessions.local("graft-pipeline-demo", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val rawRoot = s"$work/raw-data"
    val resultsDir = s"$work/query-results"

    // Stage 1: extract (reference test stage 1, `test_pipeline.py:18-37`)
    val fetcher: HttpJsonSource.Fetcher =
      if (live) HttpJsonSource.httpFetcher() else _ => Right(FixtureBody)
    val extract = ExtractJob.run(spark, rawRoot, fetcher)
    println(s"[stage1] extract: status=${extract.statusCode} records=${extract.recordsProcessed} → ${extract.location}")
    require(extract.statusCode == 200, s"extract failed: ${extract.error}")

    // Stage 2: data files exist (reference `test_pipeline.py:39-58`)
    val files = new java.io.File(rawRoot)
    require(files.exists, "raw-data root missing")
    println(s"[stage2] raw-data partitions: " +
      files.listFiles().filter(_.isDirectory).map(_.getName).sorted.mkString(", "))

    // Stage 3+4: crawl + table registered (reference `test_pipeline.py:60-103`)
    val crawl = TableRegistry.crawl(spark, rawRoot, "data_pipeline_db", "raw_data")
    println(s"[stage3] crawl: created=${crawl.created} partitions=${crawl.partitions} " +
      s"added=${crawl.addedColumns.size} removedLogged=${crawl.removedColumnsLogged.size}")
    val cols = spark.table("data_pipeline_db.raw_data").schema.fieldNames
    println(s"[stage4] table data_pipeline_db.raw_data: ${cols.length} columns")
    require(cols.length >= 16, "expected the 16 flat columns + partitions")

    // Stage 5: the three canonical queries via the execution manager
    // (reference `test_pipeline.py:113-132`, README.md:107-141)
    val mgr = new QueryExecutionManager(spark, resultsDir)
    val canonical = Seq(
      "Total records" ->
        "SELECT COUNT(*) AS record_count FROM data_pipeline_db.raw_data",
      "Sample user data" ->
        "SELECT name, email, address_city FROM data_pipeline_db.raw_data LIMIT 5",
      "Top cities" ->
        """SELECT address_city, COUNT(*) AS user_count FROM data_pipeline_db.raw_data
          |GROUP BY address_city ORDER BY user_count DESC LIMIT 3""".stripMargin)
    canonical.foreach { case (label, sql) =>
      val id = mgr.submit(sql)
      val st = mgr.await(id)
      println(s"[stage5] $label: ${st.status.name} (executionId=$id)")
      require(st.status == QueryExecutionManager.Status.Succeeded, st.reason)
      mgr.results(id).foreach { case (header, rows) =>
        println("         " + header.mkString(" | "))
        rows.take(5).foreach(r => println("         " + r.map(_.getOrElse("NULL")).mkString(" | ")))
      }
    }
    println(s"[done] artifacts under $resultsDir: " +
      new java.io.File(resultsDir).listFiles().map(_.getName).sorted.mkString(", "))
    spark.stop()
  }
}
