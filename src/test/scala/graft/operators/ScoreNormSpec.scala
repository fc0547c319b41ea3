package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScoreNormSpec extends SparkSpec {

  test("percentiles are mid-rank within source, independent across sources") {
    import spark.implicits._
    // srcA: scores order docs 1 < 2 < 3; srcB: one doc (pct = 1/2);
    // doc 4 empty-text → excluded
    val docs = Seq(
      (1L, "a a a a", "srcA"),           // ttr 1/4 → low score
      (2L, "a b a b a b", "srcA"),       // ttr 2/6
      (3L, "a b c d e f", "srcA"),       // ttr 1 → high
      (9L, "x y z", "srcB"),
      (4L, "", "srcA"))
      .toDF("doc_id", "text", "source")
    val got = ScoreNorm.percentilesOver(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(!got.contains(4L), "zero-token docs are excluded")
    // n=3 in srcA, all distinct scores → mid-ranks 1/6, 3/6, 5/6
    assert(got(1L) == (("srcA", 166666L)), s"got ${got(1L)}")
    assert(got(2L) == (("srcA", 500000L)))
    assert(got(3L) == (("srcA", 833333L)))
    // a single-doc source sits at its own median
    assert(got(9L) == (("srcB", 500000L)))
  }

  test("tied scores share one mid-rank percentile") {
    import spark.implicits._
    // two identical docs + one better: the tie group holds ranks {1,2},
    // average rank 1.5 → pct (1.5 − 0.5)/3 = 1/3
    val docs = Seq(
      (1L, "a a b b", "s"), (2L, "a a b b", "s"), (3L, "a b c d", "s"))
      .toDF("doc_id", "text", "source")
    val got = ScoreNorm.percentilesOver(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == got(2L), "equal scores must normalize identically")
    assert(got(1L) == 333333L, s"mid-rank of the tied pair: got ${got(1L)}")
    assert(got(3L) == 833333L)
  }

  test("ksOver: identical samples score 0; disjoint distributions score 1e6 and drift") {
    import spark.implicits._
    val same = (1L to 10L).map(i => (i, "a b c d", "s")).toDF("doc_id", "text", "source")
    val ks0 = ScoreNorm.ksOver(same, same).collect()
    assert(ks0.length == 1)
    assert(ks0(0).getLong(3) == 0L && !ks0(0).getBoolean(4))
    val low = (1L to 10L).map(i => (i, "a a a a", "s")).toDF("doc_id", "text", "source")
    val ks1 = ScoreNorm.ksOver(same, low).collect()
    assert(ks1(0).getLong(3) == 1000000L, "disjoint score supports → sup gap 1")
    assert(ks1(0).getBoolean(4), "KS 1.0 at n=10 per side is significant")
  }

  test("q221 on the corpus: one row per source, bounded KS") {
    val rows = ScoreNorm.q221ScoreKsDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000)
    }
  }

  test("q224 stream screen lands on exactly the q218 batch rows") {
    val streamed = graft.streaming.PercentileStream
      .q224StreamPercentileScreen(spark, sf).collect().map(_.toString).sorted
    val batch = ScoreNorm.q218ScorePercentiles(spark, sf)
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      "the frozen-calibration screen diverged from the batch normalization")
  }

  test("q218 on the corpus: value-grain CDF, bounded and monotone per source") {
    val rows = ScoreNorm.q218ScorePercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) > 0 && r.getLong(3) < 1000000),
      "mid-rank percentiles are strictly inside (0, 1e6)")
    // within a source, percentile must be monotone in the score
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(3)))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) <= b.getLong(3),
            s"pct not monotone in score within ${a.getString(1)}")
        case _ =>
      }
    }
  }
}
