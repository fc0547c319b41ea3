package graft.functions

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Tables

/** The Presto/Athena migration pack (round-14 verdict item 3): the
  * function names an Athena user's queries carry in their first week,
  * each shimmed as a NATIVE Catalyst expression and proven against
  * Presto's documented semantics — plus the names Spark already shares
  * with Presto (`element_at`, `split_part`, `try_cast`, `bool_and`),
  * exercised so a rename in either engine breaks a test, not a user. */
class DialectPackSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("mysqlToJavaPattern translates the MySQL directive table") {
    assert(Dialect.mysqlToJavaPattern("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss")
    assert(Dialect.mysqlToJavaPattern("%d/%m/%Y") == "dd/MM/yyyy")
    assert(Dialect.mysqlToJavaPattern("%Y-%m-%dT%H:%i:%s") == "yyyy-MM-dd'T'HH:mm:ss")
    assert(Dialect.mysqlToJavaPattern("%T") == "HH:mm:ss")
    // alphabetic literal runs are quoted so Java cannot reinterpret them
    assert(Dialect.mysqlToJavaPattern("at %H") == "'at 'HH")
    // %% is a literal percent (and lands inside the quoted run)
    assert(Dialect.mysqlToJavaPattern("%%Y") == "'%Y'")
    val e = intercept[IllegalArgumentException] {
      Dialect.mysqlToJavaPattern("%Q")
    }
    assert(e.getMessage.contains("unsupported MySQL format directive"))
  }

  test("date_parse parses MySQL-format strings, not Java-pattern ones") {
    graft.core.Sessions.prepare(spark)
    val r = spark.sql(
      """SELECT
        |  date_parse('2024-03-05 07:08:09', '%Y-%m-%d %H:%i:%s') AS a,
        |  date_parse('05/03/2024', '%d/%m/%Y') AS b,
        |  date_parse('2024-03-05T07:08:09', '%Y-%m-%dT%H:%i:%s') AS c
        |""".stripMargin).head()
    assert(r.getTimestamp(0) == ts("2024-03-05 07:08:09.0"))
    assert(r.getTimestamp(1) == ts("2024-03-05 00:00:00.0"))
    assert(r.getTimestamp(2) == ts("2024-03-05 07:08:09.0"))
    // a computed format cannot be translated at plan time: fail loudly
    // instead of silently misparsing (the failure mode the shim exists
    // to prevent)
    val e = intercept[Exception] {
      spark.sql("SELECT date_parse(x, x) FROM VALUES ('%Y') t(x)").collect()
    }
    assert(e.getMessage.contains("date_parse expects"))
  }

  test("from_iso8601_timestamp / approx_distinct / arbitrary semantics") {
    graft.core.Sessions.prepare(spark)
    val r = spark.sql(
      "SELECT from_iso8601_timestamp('2024-03-05T07:08:09') AS t").head()
    assert(r.getTimestamp(0) == ts("2024-03-05 07:08:09.0"))
    // HLL++ at Presto's default error is exact on a small distinct set
    val ad = spark.sql(
      """SELECT approx_distinct(x) AS a, approx_distinct(x, 0.04) AS b
        |FROM VALUES (1), (2), (3), (2), (1) t(x)""".stripMargin).head()
    assert(ad.getLong(0) == 3L && ad.getLong(1) == 3L)
    // arbitrary over a functionally-dependent column is deterministic
    val arb = spark.sql(
      """SELECT k, arbitrary(v) AS v FROM VALUES (1, 'a'), (1, 'a'), (2, 'b') t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(arb.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("names Presto and Spark already share stay available un-shimmed") {
    graft.core.Sessions.prepare(spark)
    val r = spark.sql(
      """SELECT
        |  element_at(split('a:b:c', ':'), 2) AS e,
        |  split_part('a:b:c', ':', 3) AS sp,
        |  try_cast('notanumber' AS bigint) AS bad,
        |  try_cast(' 42 ' AS bigint) AS good,
        |  bool_and(true) AS ba
        |""".stripMargin).head()
    assert(r.getString(0) == "b")
    assert(r.getString(1) == "c")
    assert(r.isNullAt(2))
    assert(r.getLong(3) == 42L)
    assert(r.getBoolean(4))
  }

  test("q253 runs the Presto-dialect text verbatim with no UDF in the plan") {
    val df = graft.operators.Relational.q253PrestoDialect(spark, sf)
    val rows = df.collect()
    assert(rows.length == 5, "one row per event_type")
    rows.foreach { r =>
      assert(r.getBoolean(3), "approx_distinct must sit within 2 sigma of exact")
      assert(r.getBoolean(4), "the MySQL-format and ISO parse routes must agree")
      assert(r.getString(7) == "k", "arbitrary over the single-valued prop key")
    }
    // every shim is a native expression: a UDF would appear as ScalaUDF
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"dialect pack must stay codegen-native\n$plan")
  }
}
