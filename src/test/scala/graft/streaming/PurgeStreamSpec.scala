package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Purge

class PurgeStreamSpec extends SparkSpec {

  test("q238: the drained survivors equal the batch purge of the document store") {
    val drained = PurgeStream.q238StreamPurge(spark, sf)
    val batch = Purge.purged(
        graft.core.Tables.documents(spark, sf), col("doc_id"),
        Purge.tombstones(spark, sf))
      .select("doc_id", "source", "n_chars")
    assert(drained.exceptAll(batch).isEmpty && batch.exceptAll(drained).isEmpty,
      "stream survivors diverged from the batch purge")
  }

  test("q238: no tombstoned id survives the screen, and only tombstoned ids are dropped") {
    val out = PurgeStream.q238StreamPurge(spark, sf)
    assert(out.filter(col("doc_id") % Purge.TombstoneMod === 0).count() == 0L,
      "a tombstoned document re-entered at ingest")
    val total = graft.core.Tables.documents(spark, sf).count()
    val tomb = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") % Purge.TombstoneMod === 0).count()
    assert(out.count() == total - tomb, "the screen dropped a non-tombstoned document")
  }
}
