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
}
