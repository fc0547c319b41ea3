package graft.operators

import graft.SparkSpec
import graft.core.Tables

class RelationalExtraSpec extends SparkSpec {

  test("q74 JSON extraction buckets every event with a valid props.k") {
    val rows = Relational.q74JsonExtract(spark, sf).collect()
    assert(rows.nonEmpty)
    // decile buckets are sane and counts conserve the event total
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 9))
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, sf).count(),
      "every event carries a parseable props.k in the fixture")
  }

  test("q75 rollup: detail rows sum to subtotals, subtotals to the grand total") {
    val rows = Relational.q75Rollup(spark, sf).collect()
    val detail = rows.filter(_.getLong(2) == 0L)
    val subtotals = rows.filter(_.getLong(2) == 1L)
    val grand = rows.filter(_.getLong(2) == 3L)
    assert(grand.length == 1)
    assert(detail.map(_.getLong(3)).sum == grand.head.getLong(3))
    assert(subtotals.map(_.getLong(3)).sum == grand.head.getLong(3))
    // each subtotal row aggregates its flag's detail rows
    subtotals.foreach { s =>
      val flag = s.getString(0)
      assert(s.getLong(3) == detail.filter(_.getString(0) == flag).map(_.getLong(3)).sum)
      assert(s.isNullAt(1), "subtotal rows null out the aggregated-away column")
    }
    assert(grand.head.isNullAt(0) && grand.head.isNullAt(1))
  }

  test("q81 cube: every grouping-set cut sums to the grand total") {
    val rows = Relational.q81Cube(spark, sf).collect()
    val detail = rows.filter(_.getLong(2) == 0L)       // (flag, status)
    val byFlag = rows.filter(_.getLong(2) == 1L)       // (flag, ·)
    val byStatus = rows.filter(_.getLong(2) == 2L)     // (·, status) — the cut ROLLUP lacks
    val grand = rows.filter(_.getLong(2) == 3L)
    assert(grand.length == 1)
    val total = grand.head.getLong(3)
    assert(detail.map(_.getLong(3)).sum == total)
    assert(byFlag.map(_.getLong(3)).sum == total)
    assert(byStatus.map(_.getLong(3)).sum == total)
    byStatus.foreach { s =>
      assert(s.isNullAt(0), "per-status rows null out the flag")
      val status = s.getString(1)
      assert(s.getLong(3) == detail.filter(_.getString(1) == status).map(_.getLong(3)).sum)
    }
  }

  test("q91 grouping sets: exactly the three declared cuts, no grand total") {
    val rows = Relational.q91GroupingSets(spark, sf).collect()
    val gids = rows.map(_.getLong(2)).toSet
    assert(gids == Set(0L, 1L, 2L), s"unexpected grouping ids: $gids")
    val detail = rows.filter(_.getLong(2) == 0L)
    val byFlag = rows.filter(_.getLong(2) == 1L)
    val byStatus = rows.filter(_.getLong(2) == 2L)
    val total = detail.map(_.getLong(3)).sum
    assert(byFlag.map(_.getLong(3)).sum == total)
    assert(byStatus.map(_.getLong(3)).sum == total)
    // the set list (a,b),(a),(b) is expressible by neither rollup (no
    // (·,b) cut) nor cube (which would add the grand total)
    assert(!gids.contains(3L))
  }

  test("q103 window family: functions agree with first-principles ranks") {
    val rows = Relational.q103WindowFamily(spark, sf).collect()
    assert(rows.length == 15) // 3 per priority
    rows.groupBy(_.getString(0)).foreach { case (_, group) =>
      val sorted = group.sortBy(_.getLong(3))
      // unique tie-break ⇒ rn == rnk == drnk on the top-3 slice
      sorted.foreach { r =>
        assert(r.getLong(3) == r.getLong(4) && r.getLong(4) == r.getLong(5))
        assert(r.getLong(6) == 1L, "top-3 rows sit in the first quartile")
        assert(r.getDouble(8) > r.getDouble(7),
          "cume_dist > percent_rank on a unique ordering")
      }
      // prices non-increasing down the ranks
      assert(sorted.map(_.getDouble(2)).toSeq ==
        sorted.map(_.getDouble(2)).sortBy(-(_: Double)).toSeq)
    }
  }

  test("q104 set ops: the three tags partition urgent ∪ rich exactly") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q104SetOps(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byOp = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val urgent = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val rich = graft.core.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 5000)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(byOp("both") == (urgent intersect rich))
    assert(byOp("urgent_only") == (urgent diff rich))
    assert(byOp("rich_only") == (rich diff urgent))
    assert(rows.length == rows.toSet.size, "tags are disjoint")
  }

  test("q105 sketch gate: approx percentiles sit within the rank bound") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q105ApproxPercentileGate(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"${r.getString(0)}: sketch outside its rank bound")
      // the exact columns really are the order statistics: recount ranks
      val prices = graft.core.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === r.getString(0))
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      val below = prices.count(_ <= r.getDouble(2)).toDouble / prices.length
      assert(below >= 0.49 && below <= 0.52, s"median rank off: $below")
    }
  }
}
