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

  test("q134: removing the top component shrinks norms and matches a driver recompute") {
    val rows = Pca.q134AllButTop(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nVec = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.length == nVec)
    // removing a projection can never grow the vector... up to the micro
    // re-quantization of the removed component (bounded by dim/4 in the
    // squared norm: each dimension moves < 1/2 micro^2... allow dim slack)
    rows.foreach { case (id, _, before, after) =>
      assert(after <= before + Pca.Dim,
        s"vec $id: norm2 grew $before -> $after after removing the projection")
    }
    // the corpus-level norm mass must DROP materially: the fixture's
    // clustered embeddings share a strong common direction
    val (sumB, sumA) = (rows.map(_._3.toDouble).sum, rows.map(_._4.toDouble).sum)
    assert(sumA < sumB, s"no anisotropy removed: $sumB -> $sumA")

    // exact per-vector recompute on the driver from the same cached model
    val (mu, v) = Pca.model(spark, sf)
    val vv = v.map(x => x * x).sum
    def haDiv(p: Long): Long =
      if (p >= 0) (p + 500000L) / 1000000L else -((-p + 500000L) / 1000000L)
    def ha(y: Double): Long =
      (if (y >= 0) math.floor(y + 0.5) else -math.floor(-y + 0.5)).toLong
    val quant = KMeans.quantized(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    rows.foreach { case (id, proj, before, after) =>
      val c = quant(id).zip(mu).map { case (a, b) => a - b }
      val dot = c.zip(v).map { case (a, b) => a * b }.sum
      assert(before == c.map(x => x * x).sum, s"vec $id norm2_before")
      assert(proj == ha(1e6 * dot.toDouble / vv.toDouble), s"vec $id proj")
      val cp = c.zip(v).map { case (ci, vi) => ci - haDiv(proj * vi) }
      assert(after == cp.map(x => x * x).sum, s"vec $id norm2_after")
    }
  }
}
