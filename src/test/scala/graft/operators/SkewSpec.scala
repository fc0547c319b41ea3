package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted join equals plain join on a pathologically skewed key") {
    import spark.implicits._
    // 10k rows, 90% on one key — the case AQE sort-merge splitting
    // handles late and salting handles at plan time
    val big = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val medium = Seq.tabulate(1001)(i => (i.toLong, s"m$i")).toDF("k", "name")
    val salted = Skew.saltedJoin(big, medium, Seq("k"), saltBuckets = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val plain = big.join(medium, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
    assert(plain.exists(_._3 == 9000L), "the hot key should dominate")
  }

  test("q52 salted fact join groups revenue per priority") {
    val rows = Skew.q52SkewJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    assert(rows.map(_.getLong(1)).sum == graft.core.Tables.lineitem(spark, sf).count())
  }

  test("q198 skew report equals a driver replay and its arithmetic holds") {
    val counts = graft.core.Tables.events(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val mean = total / counts.size
    val expect = counts.toSeq
      .sortBy { case (k, c) => (-c, k) }.take(Skew.ReportTopK)
      .map { case (k, c) =>
        (k, c, counts.size.toLong, total, c * 1000000L / total,
          (c + mean - 1) / mean) }
    val got = Skew.q198SkewReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    got.foreach { case (_, cnt, _, _, share, salt) =>
      assert(share > 0 && share <= 1000000L)
      assert(salt >= 1L, "a reported key carries at least one mean's worth")
      assert(salt <= cnt, "salt can never exceed the key's own row count")
    }
  }

  test("a planted hot key dominates the report with a matching salt recommendation") {
    import spark.implicits._
    // 1000 rows: key 7 owns 500 of them, 100 other keys share the rest
    val df = spark.range(0, 1000)
      .select(when(col("id") < 500, 7L).otherwise(col("id") % 100 + 100).as("k"))
    val top = Skew.skewReport(df, "k").collect()(0)
    assert(top.getLong(0) == 7L && top.getLong(1) == 500L)
    assert(top.getLong(4) == 500000L, "half the corpus in integer micros")
    // mean = 1000 div 101 = 9; ceil(500/9) = 56 reducers' worth
    assert(top.getLong(5) == (500L + 9 - 1) / 9)
  }
}
