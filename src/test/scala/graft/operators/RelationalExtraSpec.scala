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
}
