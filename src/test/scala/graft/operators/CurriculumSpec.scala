package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurriculumSpec extends SparkSpec {

  test("q189 shards are contiguous, exhaustive and quality-monotone") {
    val rows = Curriculum.q189CurriculumShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // rank ranges tile [1, n] with no gaps or overlaps
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._4 + 1, s"rank gap between $a and $b")
      case _ =>
    }
    assert(rows.head._3 == 1L && rows.last._4 == nDocs)
    // quality bands never increase across shards (the curriculum order)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5 <= a._6, s"shard ${b._1} q_max ${b._5} above shard ${a._1} q_min ${a._6}")
      case _ =>
    }
  }

  test("q189's global order never single-partitions (the q175 window-free contract)") {
    val df = Curriculum.q189CurriculumShards(spark, sf)
    df.collect()
    val exchanges = graft.layout.BucketedLayout
      .collectExchanges(df.queryExecution.executedPlan)
    assert(!exchanges.exists(_.contains("SinglePartition")),
      s"q189 coalesces to one partition: $exchanges")
  }

  test("q190 streamed routing equals the batch tagging minus 'none'") {
    val batch = Taxonomy.tagged(graft.core.Tables.documents(spark, sf))
      .filter(col("topic") =!= "none")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(graft.streaming.RouteStream.q190StreamTopicRoute(spark, sf)) == canon(batch))
  }
}
