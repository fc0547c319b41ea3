package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CmsSpec extends SparkSpec {

  test("q169 CMS never undercounts and the min-of-d estimate is tight on the fixtures") {
    val rows = Cms.q169CmsSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == math.min(Cms.TopN, rows.length) && rows.nonEmpty)
    rows.foreach { case (sh, exact, est, over) =>
      assert(est >= exact, s"CMS undercounted '$sh': $est < $exact")
      assert(over == est - exact)
      assert(exact >= 1)
    }
    // the report is sorted by exact df desc, shingle asc — a total order
    val keys = rows.map(r => (-r._2, r._1)).toSeq
    assert(keys == keys.sorted)
  }

  test("CMS cells are a sum monoid: per-shard sketches merge to the corpus sketch") {
    // rebuild the cell table two ways: one pass over all docs, and the
    // cell-wise SUM of two disjoint half-corpus sketches — bit equality
    // is the property that lets a 100 TB ingest sketch per shard
    val docs = graft.core.Tables.documents(spark, sf)
    def cells(d: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] = {
      val df = Dedup.shingles(d).groupBy("s").agg(count(lit(1)).as("c"))
      val hx = md5(concat(lit("cms:"), col("s")))
      val bs = (0 until Cms.D).map { r =>
        (conv(substring(hx, 1 + 4 * r, 4), 16, 10).cast("long") % Cms.W).as(s"b$r")
      }
      df.select(col("c") +: bs: _*)
        .select(col("c"), posexplode(array((0 until Cms.D).map(r => col(s"b$r")): _*)).as(Seq("r", "b")))
        .groupBy("r", "b").agg(sum(col("c")).as("cell"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    // NOTE the shards must split DOCUMENTS, not shingle counts: a
    // shingle present in both halves contributes its per-half dfs,
    // which must SUM to the corpus df — exactly the monoid claim
    val whole = cells(docs)
    val a = cells(docs.filter(col("doc_id") % 2 === 0))
    val b = cells(docs.filter(col("doc_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map { k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole, "cell-wise shard merge must equal the one-pass sketch")
  }
}
