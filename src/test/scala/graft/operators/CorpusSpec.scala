package graft.operators

import graft.SparkSpec

class CorpusSpec extends SparkSpec {

  test("corpus diff emits exactly the added/removed/changed docs, never unchanged") {
    val rows = Corpus.q66CorpusDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    // recompute membership from the fixture rules
    val ids = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    ids.foreach { case (id, text) =>
      val inV1 = id % Corpus.RemovedInV2Mod != Corpus.RemovedInV2Rem
      val inV2 = id % Corpus.DroppedFromV1Mod != Corpus.DroppedFromV1Rem
      val edited = id % Corpus.ChangedMod == 0 &&
        text.toUpperCase.trim != text.trim
      val expected =
        if (!inV1 && inV2) Some("added")
        else if (inV1 && !inV2) Some("removed")
        else if (inV1 && inV2 && edited) Some("changed")
        else None
      assert(rows.get(id) == expected, s"doc $id: got ${rows.get(id)}, want $expected")
    }
  }

  test("diff output is change-sized: identical corpora diff to empty") {
    val docs = graft.core.Tables.documents(spark, sf)
    assert(Corpus.diff(docs, docs).isEmpty, "self-diff must be empty")
  }
}
