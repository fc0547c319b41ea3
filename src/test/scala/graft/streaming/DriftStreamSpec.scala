package graft.streaming

import graft.SparkSpec
import graft.operators.{Drift, SnapshotFixture}

class DriftStreamSpec extends SparkSpec {

  test("q197 maintained PSI equals the batch PSI of reference vs full corpus") {
    val streamed = DriftStream.q197StreamScoreDrift(spark, sf).collect()
      .map(_.toString).toSeq
    val batch = Drift.psiOver(
        SnapshotFixture.table(spark, sf, "documents_v1_edit"),
        graft.core.Tables.documents(spark, sf)).collect()
      .map(_.toString).toSeq
    assert(streamed == batch,
      "the ingest-maintained histogram must reproduce the batch report")
    assert(streamed.length == Drift.Buckets)
  }

  test("the live histogram covers every document exactly once") {
    val rows = DriftStream.q197StreamScoreDrift(spark, sf).collect()
    val liveTotal = rows.map(_.getLong(2)).sum
    assert(liveTotal == graft.core.Tables.documents(spark, sf).count())
  }
}
