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
    assert(res2.typeChangedColumns.isEmpty)
  }

  test("re-crawl updates a column whose inferred type widened (UPDATE_IN_DATABASE)") {
    val root = Files.createTempDirectory("graft_crawl3")
    val part = root.resolve("year=2026/month=01/day=01")
    Files.createDirectories(part)
    Files.writeString(part.resolve("data.csv"), "id,score\n1,10\n2,20\n")
    val res1 = TableRegistry.crawl(spark, root.toString, "data_pipeline_db", "raw_data3")
    assert(res1.created)
    assert(spark.table("data_pipeline_db.raw_data3").schema("score").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // new day's data makes the column infer as double → type update on re-crawl
    Files.writeString(part.resolve("data.csv"), "id,score\n1,10.5\n2,20.5\n")
    val res2 = TableRegistry.crawl(spark, root.toString, "data_pipeline_db", "raw_data3")
    assert(!res2.created && res2.typeChangedColumns == Seq("score"))
    assert(spark.table("data_pipeline_db.raw_data3").schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // the rebuilt catalog entry still reads the partitioned data
    val s = spark.sql("SELECT sum(score) AS s FROM data_pipeline_db.raw_data3").head().getDouble(0)
    assert(math.abs(s - 31.0) < 1e-9)
  }
}
