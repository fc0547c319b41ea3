package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedEventsLayoutSpec extends SparkSpec {

  test("the layout writes one directory per date and a focus window of the declared width") {
    val root = PartitionedEventsLayout.ensure(spark, sf)
    val partDirs = Option(new java.io.File(s"$root/events").listFiles())
      .getOrElse(Array.empty).filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    val nDates = graft.core.Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    assert(partDirs.length == nDates,
      s"${partDirs.length} partition dirs for $nDates distinct dates")
    val focus = spark.read.parquet(s"$root/calendar")
      .filter(col("day_off").between(
        PartitionedEventsLayout.FocusLo, PartitionedEventsLayout.FocusHi)).count()
    assert(focus ==
      PartitionedEventsLayout.FocusHi - PartitionedEventsLayout.FocusLo + 1)
  }

  test("q188's fact scan carries a runtime dynamic-pruning partition filter") {
    val df = PartitionedEventsLayout.q188DppJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"q188: no DynamicPruningExpression on the partitioned scan —\n$plan")
  }

  test("layout never changes answers: q188 equals the same aggregate over the raw table") {
    val raw = graft.core.Tables.events(spark, sf)
      .withColumn("d", to_date(col("ts")))
    val mn = raw.agg(min(col("d"))).collect()(0).getDate(0)
    val expect = raw.filter(col("d").between(
        date_add(lit(mn), PartitionedEventsLayout.FocusLo),
        date_add(lit(mn), PartitionedEventsLayout.FocusHi)))
      .groupBy(col("d"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("sum_cents"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("sum_cents"))
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(_.toString).toSeq.sorted
    assert(canon(PartitionedEventsLayout.q188DppJoin(spark, sf)) == canon(expect))
  }
}
