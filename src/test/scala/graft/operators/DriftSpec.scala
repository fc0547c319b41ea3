package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  test("identical snapshots have zero PSI in every bucket") {
    val v = graft.core.Tables.documents(spark, sf)
    val rows = Drift.psiOver(v, v).collect()
    assert(rows.length == Drift.Buckets)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "identical counts")
      assert(r.getLong(5) == 0L, s"bucket ${r.getLong(0)}: psi must be 0")
    }
  }

  test("a planted case-mangling regression drifts its score bucket") {
    import spark.implicits._
    // v2 is clean; v1 mangled a third of the docs to upper case —
    // exactly the extraction regression the monitor exists to catch
    val docs = (1L to 30L).map { i =>
      (i, (0 until 50).map(j => s"w${(i * 7 + j) % 90}").mkString(" "))
    }.toDF("doc_id", "text")
    val v1 = docs.withColumn("text",
      when(col("doc_id") % 3 === 0, upper(col("text"))).otherwise(col("text")))
    val rows = Drift.psiOver(v1, docs).collect()
    val totalPsi = rows.map(_.getLong(5)).sum
    assert(totalPsi > 10000L,
      s"the mangled corpus must show drift, got $totalPsi micros")
    // PSI is (near) non-negative per bucket: the truncation floor can
    // leave at most a micro-unit below zero, never a real negative
    rows.foreach(r => assert(r.getLong(5) >= -1L))
  }

  test("q196 detects the fixture's v1 case edits and shares are conserved") {
    val df = Drift.q196ScoreDriftPsi(spark, sf)
    val rows = df.collect()
    assert(rows.length == Drift.Buckets)
    assert(rows.map(_.getLong(5)).sum > 0L,
      "the snapshot fixture's case edits must register as drift")
    // smoothed shares sum to 1e6 minus at most one floor unit per bucket
    Seq("share_v1_micro", "share_v2_micro").foreach { c =>
      val s = df.agg(sum(col(c))).collect()(0).getLong(0)
      assert(s <= 1000000L && s > 1000000L - Drift.Buckets, s"$c sums to $s")
    }
  }
}
