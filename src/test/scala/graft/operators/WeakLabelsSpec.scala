package graft.operators

import graft.SparkSpec

class WeakLabelsSpec extends SparkSpec {

  test("LF thresholds and the majority vote on crafted boundary documents") {
    import spark.implicits._
    // lengths straddle LenLo/LenHi exactly; filler/ttr pinned per case
    def doc(n: Int, distinct: Boolean, filler: Int): String = {
      val fill = Seq.fill(filler)("the")
      val body =
        if (distinct) (0 until (n - filler)).map(i => s"w$i")
        else Seq.fill(n - filler)("w0")
      (fill ++ body).mkString(" ")
    }
    val docs = Seq(
      (1L, doc(70, distinct = true, 0)),  // len +1, ttr +1, filler +1 -> vote 1
      (2L, doc(30, distinct = false, 3)), // len -1, ttr -1 (1/30), filler 100k -1 -> vote -1
      (3L, doc(31, distinct = false, 1))) // len 0 (31), ttr -1, filler 32258 0 -> vote -1
      .toDF("doc_id", "text")
    val got = WeakLabels.labeled(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(got(1L) == ((1, 1, 1, 1)))
    assert(got(2L) == ((-1, -1, -1, -1)))
    assert(got(3L) == ((0, -1, 0, -1)))
  }

  test("a tie of opposing LFs abstains") {
    import spark.implicits._
    // 70 distinct tokens of which 35 are 'the': len +1, ttr 0 (500000),
    // filler -1 (500000) -> sum 0 -> abstain
    val text = (Seq.fill(35)("the") ++ (0 until 35).map(i => s"w$i")).mkString(" ")
    val got = WeakLabels.labeled(Seq((9L, text)).toDF("doc_id", "text"))
      .collect()(0)
    assert(got.getInt(1) == 1 && got.getInt(3) == -1 && got.getInt(4) == 0)
  }

  test("q203 matrix internal consistency on the fixture") {
    val rows = WeakLabels.q203WeakLabelMatrix(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("filler", "length", "ttr"))
    rows.foreach { r =>
      val (cov, pos, neg, dec, agree) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(pos + neg == cov, "polarity counts partition coverage")
      assert(dec <= cov && agree <= dec)
      assert(r.getLong(6) == 1000000L * agree / math.max(dec, 1L))
    }
  }

  test("q223 kappa equals an exact driver replay of the per-doc LF frame") {
    val lfs = WeakLabels.labeled(graft.core.Tables.documents(spark, sf))
      .select("lf_length", "lf_ttr", "lf_filler").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val n = lfs.length.toLong
    def kappa(a: ((Int, Int, Int)) => Int, b: ((Int, Int, Int)) => Int): Long = {
      val agree = lfs.count(t => a(t) == b(t)).toLong
      val s = Seq(-1, 0, 1).map(c =>
        lfs.count(t => a(t) == c).toLong * lfs.count(t => b(t) == c)).sum
      val num = agree * n - s
      val den = math.max(n * n - s, 1L)
      if (num < 0) -((1000000L * -num) / den) else (1000000L * num) / den
    }
    val expect = Map(
      ("length", "ttr") -> kappa(_._1, _._2),
      ("length", "filler") -> kappa(_._1, _._3),
      ("ttr", "filler") -> kappa(_._2, _._3))
    val got = WeakLabels.q223LfAgreement(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got == expect, s"engine $got vs replay $expect")
  }
}
