package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderLayoutSpec extends SparkSpec {

  test("spread16 column arithmetic equals the reference bit ladder") {
    import spark.implicits._
    val xs = Seq(0L, 1L, 2L, 0xFFL, 0xABCDL, 0xFFFFL, 12345L)
    val got = xs.toDF("x")
      .select(col("x"), ZOrderLayout.spread16(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x => assert(got(x) == ZOrderLayout.spread16Ref(x), s"x=$x") }
    // spread bits land only on even positions; interleave is disjoint
    xs.foreach { x => assert((ZOrderLayout.spread16Ref(x) & 0xAAAAAAAAL) == 0L) }
  }

  test("z-order files prune a value-band query that a user-sorted layout cannot") {
    val dir = sf
    val zPath = ZOrderLayout.ensure(spark, dir)
    // a single-column-sorted twin (the layout z-order replaces)
    val linPath = java.nio.file.Files.createTempDirectory("graft-linear").toString
    val ev = graft.core.Tables.events(spark, dir)
      .withColumn("value_cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
    ev.repartitionByRange(ZOrderLayout.ZFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linPath)
    // per-file min/max of value_cents — the stats a reader prunes on
    def fileSpans(path: String): Seq[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min("value_cents"), max("value_cents")).collect()(0)
          (r.getLong(0), r.getLong(1))
        }
    val (lo, hi) = (ZOrderLayout.CentsLo, ZOrderLayout.CentsHi)
    def touched(spans: Seq[(Long, Long)]): Int =
      spans.count { case (mn, mx) => mx >= lo && mn <= hi }
    val zTouched = touched(fileSpans(zPath))
    val linTouched = touched(fileSpans(linPath))
    val zTotal = fileSpans(zPath).size
    // the user-sorted layout is blind to value: every file spans the
    // whole value range and none can be skipped
    assert(linTouched == fileSpans(linPath).size,
      s"user-sorted layout unexpectedly prunes on value ($linTouched)")
    // the z-layout skips a real share of its files on the same band
    assert(zTouched <= zTotal / 2,
      s"z-order should prune at least half the files: $zTouched of $zTotal intersect")
  }

  test("q181: layout never changes answers (gate equals a direct recompute)") {
    val got = ZOrderLayout.q181ZorderRange(spark, sf).collect()(0)
    val direct = graft.core.Tables.events(spark, sf)
      .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .filter(col("user_id").between(ZOrderLayout.UserLo, ZOrderLayout.UserHi) &&
        col("cents").between(ZOrderLayout.CentsLo, ZOrderLayout.CentsHi))
      .agg(count(lit(1)), countDistinct(col("user_id")), sum(col("cents")),
        min(col("cents")), max(col("cents"))).collect()(0)
    assert(got.getLong(0) == direct.getLong(0) && got.getLong(0) > 0)
    (1 to 4).foreach(i => assert(got.getLong(i) == direct.getLong(i), s"col $i"))
  }
}
