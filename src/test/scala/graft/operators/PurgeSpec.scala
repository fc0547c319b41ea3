package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PurgeSpec extends SparkSpec {

  test("purged() removes exactly the tombstoned keys and nothing else") {
    val docs = graft.core.Tables.documents(spark, sf)
    val tomb = Purge.tombstones(spark, sf)
    val out = Purge.purged(docs, col("doc_id"), tomb)
    assert(out.filter(col("doc_id") % Purge.TombstoneMod === 0).count() == 0)
    assert(out.count() ==
      docs.count() - docs.filter(col("doc_id") % Purge.TombstoneMod === 0).count())
  }

  test("q202 audit rows balance and every surface comes out clean") {
    val rows = Purge.q202PurgeCascade(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("chunks", "documents", "embeddings"))
    rows.foreach { r =>
      val (before, tombed, after) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(before == tombed + after, s"${r.getString(0)} counts must balance")
      assert(tombed > 0, s"${r.getString(0)} must have tombstoned rows on the fixture")
      assert(r.getBoolean(4), s"${r.getString(0)} residual must be zero")
    }
  }

  test("the purge is a broadcast anti-join — the corpus never shuffles") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = Purge.purged(docs, col("doc_id"), Purge.tombstones(spark, sf))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"purge must plan as a broadcast anti-join —\n$plan")
  }
}
