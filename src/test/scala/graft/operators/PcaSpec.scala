package graft.operators

import graft.SparkSpec

class PcaSpec extends SparkSpec {

  test("q133: inf-norm scaling, determinism, and alignment with a float reference") {
    val rows = Pca.q133PcaPower(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.length == Pca.Dim)
    assert(rows.map(_._1).toSeq == (1 to Pca.Dim))
    assert(rows.map(x => math.abs(x._2)).max == 1000000L, "inf-norm = 1e6")
    val again = Pca.q133PcaPower(spark, sf).collect().map(_.getLong(1)).toSeq
    assert(rows.map(_._2).toSeq == again)

    // reference: plain double-precision covariance + long power iteration
    // over the collected fixture (test-only collect; the corpus is tiny
    // here) — the integer-exact engine path must land on the same ray
    val pts = graft.core.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = pts.length
    val d = Pca.Dim
    val mu = Array.tabulate(d)(i => pts.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      pts.map(p => (p(i) - mu(i)) * (p(j) - mu(j))).sum / n
    }
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    (1 to 200).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    val e = rows.map(_._2.toDouble)
    val cos = (0 until d).map(i => e(i) * v(i)).sum /
      (math.sqrt(e.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(math.abs(cos) > 0.98, s"engine component misaligned: |cos| = ${math.abs(cos)}")
  }
}
