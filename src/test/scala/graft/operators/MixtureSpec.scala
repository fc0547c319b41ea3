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
}
