package graft.exec

import java.nio.file.Files

import graft.SparkSpec

class CleanupJobSpec extends SparkSpec {

  test("ordered teardown drops db + tables, purges results and dirs, verifies clean") {
    // set up: a registered database with a table, a results dir with
    // artifacts, a warehouse dir with files
    val warehouse = Files.createTempDirectory("graft_cleanup_wh")
    val results = Files.createTempDirectory("graft_cleanup_res")
    Files.writeString(results.resolve("abc.csv.metadata"), "{}")
    Files.createDirectories(warehouse.resolve("t"))
    Files.writeString(warehouse.resolve("t/part-0.parquet"), "x")

    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cleanup_db")
    graft.core.Tables.region(spark, sf)
      .write.mode("overwrite")
      .option("path", warehouse.resolve("region_t").toString)
      .saveAsTable("graft_cleanup_db.region_t")
    assert(spark.catalog.tableExists("graft_cleanup_db.region_t"))

    val report = CleanupJob.run(
      spark,
      db = Some("graft_cleanup_db"),
      resultsDir = Some(results.toString),
      warehouseDirs = Seq(warehouse.toString))

    assert(report.droppedTables == Seq("graft_cleanup_db.region_t"))
    assert(report.droppedDatabases == Seq("graft_cleanup_db"))
    assert(report.purgedResults.contains("abc.csv.metadata"))
    assert(report.purgedDirs == Seq(warehouse.toString))
    assert(!spark.catalog.databaseExists("graft_cleanup_db"))
    assert(!Files.exists(warehouse))
    // results dir itself survives (it's the store, not an artifact) but is empty
    assert(report.leftovers.isEmpty, s"leftovers: ${report.leftovers}")
  }

  test("teardown is failure-isolated and idempotent on an empty engine") {
    val report = CleanupJob.run(
      spark,
      db = Some("graft_never_existed"),
      resultsDir = Some("/tmp/graft_no_such_results_dir"),
      warehouseDirs = Seq("/tmp/graft_no_such_wh"))
    assert(report.droppedTables.isEmpty)
    assert(report.droppedDatabases.isEmpty)
    assert(report.purgedResults.isEmpty)
    assert(report.purgedDirs.isEmpty)
    assert(report.leftovers.isEmpty)
  }
}
