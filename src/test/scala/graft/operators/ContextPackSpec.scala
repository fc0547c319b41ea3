package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContextPackSpec extends SparkSpec {

  test("q211 packs a greedy ranked prefix within the budget") {
    val rows = Retrieval.q211ContextPack(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      Retrieval.QuerySet.map(_._1).distinct.sorted)
    rows.foreach { r =>
      val (cands, packed, toks, fill) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(toks <= Retrieval.ContextBudgetTokens, "never over budget")
      assert(packed <= cands)
      assert(packed > 0, "the fixture corpus fills at least one document")
      assert(fill == 1000000L * toks / Retrieval.ContextBudgetTokens)
    }
  }

  test("q211 equals a driver replay of rank-then-prefix over the q70 scores") {
    // replay: full BM25 candidate list per query from the q70 machinery
    // at k = corpus size, joined back to doc lengths
    val n = graft.core.Tables.documents(spark, sf).count().toInt
    val ranked = Retrieval.bm25TopK(
      graft.core.Tables.documents(spark, sf), Retrieval.QuerySet, n)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val dl = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("dl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = ranked.groupBy(_._1).map { case (q, docs) =>
      var cum = 0L; var packed = 0L; var toks = 0L; var stopped = false
      docs.foreach { case (_, d) =>
        cum += dl(d)
        if (!stopped && cum <= Retrieval.ContextBudgetTokens) {
          packed += 1; toks = cum
        } else stopped = true
      }
      q -> ((docs.length.toLong, packed, toks))
    }
    val got = Retrieval.q211ContextPack(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
  }
}
