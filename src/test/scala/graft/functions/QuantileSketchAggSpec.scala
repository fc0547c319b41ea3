package graft.functions

import graft.SparkSpec
import graft.functions.QuantileSketchAgg.State

class QuantileSketchAggSpec extends SparkSpec {

  private def rankErr(values: Seq[Long], est: Long, p: Int): Long = {
    val sorted = values.sorted
    val n = sorted.length.toLong
    val target = math.max(1L, (n * p + 99L) / 100L)
    val le = sorted.count(_ <= est).toLong
    val lt = sorted.count(_ < est).toLong
    math.max(0L, math.max(lt + 1 - target, target - le))
  }

  test("below one buffer the sketch is exact; estimates are real inputs") {
    val s = new State()
    val vals = (1L to 100L).reverse
    vals.foreach(s.insert)
    Seq(50, 90, 99).foreach { p =>
      val est = s.quantile(p)
      assert(rankErr(vals.toSeq, est, p) == 0L, s"p$p inexact under K")
      assert(vals.contains(est))
    }
  }

  test("rank error stays far under the gate budget on adversarial orders") {
    val n = 50000
    val orders = Map(
      "ascending" -> (1 to n).map(_.toLong),
      "descending" -> (1 to n).reverse.map(_.toLong),
      "interleaved" -> (1 to n).map(i => if (i % 2 == 0) i.toLong else (n - i).toLong))
    orders.foreach { case (name, vals) =>
      val s = new State()
      vals.foreach(s.insert)
      Seq(50, 90, 99).foreach { p =>
        val err = rankErr(vals, s.quantile(p), p)
        // gate budget is n/20 + 1 = 2501; observed should be ~K-scale
        assert(err <= n / 20 + 1, s"$name p$p err=$err breaks the gate budget")
        assert(err <= 1000L, s"$name p$p err=$err far looser than expected")
      }
    }
  }

  test("merge of shard sketches obeys the same bound (the monoid claim)") {
    val n = 40000
    val all = (1 to n).map(_.toLong)
    val (a, b) = all.splitAt(n / 3)
    val sa = new State(); a.foreach(sa.insert)
    val sb = new State(); b.foreach(sb.insert)
    // serialize across the "shuffle" before merging, like Spark does
    val sa2 = State.fromBytes(sa.toBytes)
    val sb2 = State.fromBytes(sb.toBytes)
    sa2.mergeIn(sb2)
    Seq(50, 90, 99).foreach { p =>
      val err = rankErr(all, sa2.quantile(p), p)
      assert(err <= n / 20 + 1, s"merged p$p err=$err")
    }
  }

  test("q182 gate: verdicts all true, exacts replay driver-side") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.QuantileSketch.q182QuantileSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
    rows.foreach { r =>
      val vals = ev(r.getString(0))
      assert(r.getLong(1) == vals.length.toLong)
      Seq((2, 50), (4, 90), (6, 99)).foreach { case (i, p) =>
        val n = vals.length.toLong
        val target = math.max(1L, (n * p + 99L) / 100L)
        assert(r.getLong(i) == vals((target - 1).toInt), s"exact p$p")
        assert(r.getBoolean(i + 1), s"verdict p$p must hold")
      }
    }
  }
}
