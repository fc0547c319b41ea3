package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureSpec extends SparkSpec {

  test("q193 publishes one trajectory row per domain, weights near-conserved") {
    val df = Mixture.q193DomainReweight(spark, sf)
    val rows = df.collect()
    val nSrc = graft.core.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == nSrc)
    // each round's micro weights sum to 1e6 minus at most one floor
    // unit per domain (truncating renormalization)
    Seq("w0_micro", "w1_micro", "w2_micro", "w3_micro").foreach { c =>
      val s = df.agg(sum(col(c))).collect()(0).getLong(0)
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$c sums to $s")
    }
  }

  test("a difficult domain is upweighted, an easy one downweighted") {
    import spark.implicits._
    // 'easy': the same common token repeated (low surprisal);
    // 'hard': all-unique tokens (maximal surprisal)
    val docs = Seq(
      (1L, "easy", Seq.fill(40)("the").mkString(" ")),
      (2L, "easy", Seq.fill(40)("the").mkString(" ")),
      (3L, "hard", (0 until 40).map(i => s"tok$i").mkString(" ")),
      (4L, "hard", (40 until 80).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val docTok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val total = docs.agg(
      sum(size(TextOps.tokens(col("text")))).cast("long").as("n_total"))
    val got = Mixture.reweightOver(docTok, total,
        docs.select("doc_id", "source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    val (lossEasy, w0Easy, w3Easy) = got("easy")
    val (lossHard, w0Hard, w3Hard) = got("hard")
    assert(lossHard > lossEasy, "unique tokens must score harder")
    assert(w0Easy == w0Hard, "equal token counts start at equal share")
    assert(w3Hard > w0Hard, "the hard domain must gain weight")
    assert(w3Easy < w0Easy, "the easy domain must lose weight")
  }

  test("the trajectory is deterministic") {
    def canon() = Mixture.q193DomainReweight(spark, sf)
      .collect().map(_.toString).toSeq
    assert(canon() == canon())
  }

  test("q226 ablation equals an exact driver replay of the loss frame") {
    import org.apache.spark.sql.functions._
    val docTok = TextOps.tokenStream(spark, sf)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val total = TextOps.tokenStage(spark, sf)
      .agg(count(col("token")).cast("long").as("n_total"))
    val src = graft.core.Tables.documents(spark, sf).select("doc_id", "source")
    val loss = Mixture.sourceLoss(docTok, total, src)
    val rows = loss.collect().map(r => (r.getString(0), r.getLong(1),
      BigInt(r.getDecimal(2).toBigInteger), r.getLong(3)))
    val nt = rows.map(_._2).sum
    val st = rows.map(_._3).sum
    // mirror the engines' arithmetic exactly: integer numerator cast to
    // double (round-to-nearest), ONE double division, floor
    def lossE4(s: BigInt, n: Long): Long = {
      val num = (2 * s + BigInt(100) * BigInt(n)).toDouble
      math.floor(num / (200.0 * math.max(n, 1L))).toLong
    }
    val expect = rows.map { case (source, n, s, le4) =>
      source -> ((n, le4, lossE4(st, nt), lossE4(st - s, nt - n)))
    }.toMap
    val got = Mixture.q226SourceAblation(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (sName, (n, le4, corpus, without)) =>
      val (en, ele4, ecorpus, ewithout) = expect(sName)
      assert(n == en && le4 == ele4, s"$sName: per-source loss mismatch")
      assert(corpus == ecorpus, s"$sName: corpus loss $corpus vs $ecorpus")
      assert(without == ewithout, s"$sName: ablated loss $without vs $ewithout")
    }
    // the delta column is exactly the difference of the two published losses
    Mixture.q226SourceAblation(spark, sf).collect().foreach { r =>
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3))
    }
  }
}
