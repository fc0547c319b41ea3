package graft.streaming

import graft.SparkSpec
import graft.operators.Cms

class CmsStreamSpec extends SparkSpec {

  test("q172: the maintained sketch equals the batch sketch cell-for-cell") {
    val streamed = CmsStream.q172StreamCms(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val batch = Cms.exactCells(graft.core.Tables.documents(spark, sf))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed == batch,
      "incremental maintenance must reproduce the batch sketch exactly " +
        "(cell monoid: merges are lossless)")
    // the hard state bound the design claims: at most d*w counters total
    assert(streamed.size <= Cms.D * Cms.W)
    assert(streamed.keys.forall { case (r, b) =>
      r >= 0 && r < Cms.D && b >= 0 && b < Cms.W
    })
    // conservation: every (doc, shingle) occurrence lands in exactly one
    // cell per row, so each row's cells sum to the corpus occurrence count
    val perRow = streamed.groupBy(_._1._1).map { case (r, m) => r -> m.values.sum }
    assert(perRow.values.toSet.size == 1,
      s"all d rows see the same increment mass: $perRow")
  }

  test("cellUpdate folds batches monotonically") {
    // replay the state transition driver-side: two batches of increments
    // to one cell must emit running totals, not per-batch counts
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def state(v: Option[CmsStream.CellState]) = TestGroupState.create[CmsStream.CellState](
      optionalState = v.map(org.apache.spark.api.java.Optional.of[CmsStream.CellState])
        .getOrElse(org.apache.spark.api.java.Optional.empty[CmsStream.CellState]()),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val s1 = state(None)
    val out1 = CmsStream.cellUpdate(7,
      Iterator(CmsStream.CellCount(7, 2L), CmsStream.CellCount(7, 1L)), s1).toSeq
    assert(out1 == Seq(CmsStream.CellOut(7, 3L)))
    val s2 = state(Some(s1.get))
    val out2 = CmsStream.cellUpdate(7, Iterator(CmsStream.CellCount(7, 2L)), s2).toSeq
    assert(out2 == Seq(CmsStream.CellOut(7, 5L)))
    // the map-side combine reduces raw increments to one row per cell
    val combined = CmsStream.combineLocal(
      Iterator(CmsStream.CellRow(7), CmsStream.CellRow(9), CmsStream.CellRow(7))).toSeq
    assert(combined.sortBy(_.cell) ==
      Seq(CmsStream.CellCount(7, 2L), CmsStream.CellCount(9, 1L)))
  }
}
