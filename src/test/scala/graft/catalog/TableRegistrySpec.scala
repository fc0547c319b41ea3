package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.ExtractJob

class TableRegistrySpec extends SparkSpec {

  val fixture: String =
    """[{"id":1,"name":"A","username":"a","email":"a@x.org","phone":"1","website":"w",
      |"address":{"street":"s","suite":"1","city":"C","zipcode":"z","geo":{"lat":"1.0","lng":"2.0"}},
      |"company":{"name":"c","catchPhrase":"p","bs":"b"}}]""".stripMargin

  test("crawl infers schema, registers a partitioned table, discovers partitions") {
    val root = Files.createTempDirectory("graft_crawl").toString
    ExtractJob.run(spark, root, fetcher = _ => Right(fixture))
    val res = TableRegistry.crawl(spark, root, "data_pipeline_db", "raw_data")
    assert(res.created)
    assert(res.partitions == 1)
    val n = spark.sql("SELECT count(*) AS c FROM data_pipeline_db.raw_data").head().getLong(0)
    assert(n == 1)
    // partition-pruned query works through the catalog (reference sql:204-207)
    val year = java.time.Year.now().toString
    val pruned = spark.sql(
      s"SELECT count(*) AS c FROM data_pipeline_db.raw_data WHERE year = '$year'")
      .head().getLong(0)
    assert(pruned == 1)
  }

  test("re-crawl is additive: new columns added, removals only logged") {
    val root = Files.createTempDirectory("graft_crawl2").toString
    ExtractJob.run(spark, root, fetcher = _ => Right(fixture))
    TableRegistry.crawl(spark, root, "data_pipeline_db", "raw_data2")
    val res2 = TableRegistry.crawl(spark, root, "data_pipeline_db", "raw_data2")
    assert(!res2.created && res2.addedColumns.isEmpty && res2.removedColumnsLogged.isEmpty)
  }
}
