package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class UserIngestSpec extends SparkSpec {

  /** One full fixture record + pathological partials (FIXTURES.md §1). */
  val fixtureJson: String =
    """[
      |{"id":1,"name":"Leanne Graham","username":"Bret","email":"Sincere@april.biz",
      | "address":{"street":"Kulas Light","suite":"Apt. 556","city":"Gwenborough",
      |   "zipcode":"92998-3874","geo":{"lat":"-37.3159","lng":"81.1496"}},
      | "phone":"1-770-736-8031 x56442","website":"hildegard.org",
      | "company":{"name":"Romaguera-Crona","catchPhrase":"Multi-layered client-server neural-net",
      |   "bs":"harness real-time e-markets"}},
      |{"id":2,"name":"NoAddress","username":"na","email":"na@x.org",
      | "phone":"(123) 555-0100","website":"",
      | "company":{"name":"C2","catchPhrase":null,"bs":"b"}},
      |{"id":3,"name":"NoGeo","username":"ng","email":"ng@x.org",
      | "address":{"street":"S","suite":"1","city":"Town","zipcode":"00000"},
      | "phone":"555-0101","website":"w.org"}
      |]""".stripMargin

  test("flatten is null-safe through missing nested structs (.get() chains)") {
    val flat = Flattener.flatten(HttpJsonSource.parse(spark, fixtureJson))
    val byId = flat.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("address_city") == "Gwenborough")
    assert(byId(1L).getAs[Double]("address_lat") == -37.3159)
    assert(byId(2L).getAs[String]("address_city") == null) // no address at all
    assert(byId(2L).getAs[Any]("address_lat") == null)
    assert(byId(3L).getAs[Any]("address_lat") == null) // address but no geo
    assert(byId(3L).getAs[String]("company_name") == null) // no company
    assert(flat.columns.length == 15) // 16 minus extraction_timestamp (added by stamp)
  }

  test("extract job writes Hive-partitioned CSV and reports the envelope") {
    val root = Files.createTempDirectory("graft_raw").toString
    val result = ExtractJob.run(spark, root, fetcher = _ => Right(fixtureJson))
    assert(result.statusCode == 200 && result.recordsProcessed == 3)
    // layout: root/year=YYYY/month=MM/day=DD/part-*.csv
    val back = RawData.read(spark, root)
    assert(back.count() == 3)
    val parts = back.select("year", "month", "day").distinct().collect()
    assert(parts.length == 1)
    assert(parts.head.getString(1).length == 2, "zero-padded month")
    // append model: re-extraction adds rows, never overwrites
    val r2 = ExtractJob.run(spark, root, fetcher = _ => Right(fixtureJson))
    assert(r2.statusCode == 200)
    assert(RawData.read(spark, root).count() == 6)
  }

  test("extract job surfaces fetch failures as a 500 envelope") {
    val root = Files.createTempDirectory("graft_raw_err").toString
    val result = ExtractJob.run(spark, root, fetcher = _ => Left("HTTP 503 from api"))
    assert(result.statusCode == 500 && result.error.exists(_.contains("503")))
    assert(result.recordsProcessed == 0)
  }

  test("CSV round-trip keeps empty string and null both queryable Athena-style") {
    val root = Files.createTempDirectory("graft_raw_null").toString
    ExtractJob.run(spark, root, fetcher = _ => Right(fixtureJson))
    val back = RawData.read(spark, root)
    // website was "" for id=2: after CSV round-trip it must NOT be null
    // under the != '' discrimination (reference sql:59 vs sql:123-126)
    val websites = back.filter(col("id") === 2L).select("website").collect()
    assert(websites.head.isNullAt(0) || websites.head.getString(0) == "")
    // id=2 had no address: city must satisfy IS NULL-style missing check
    val cities = back.filter(col("id") === 2L)
      .filter(col("address_city").isNull || col("address_city") === "")
    assert(cities.count() == 1)
  }
}
