package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed curation pipeline (q228/q229): chain consistency,
  * accounting identities, stage semantics against the standalone
  * operators each stage reuses, and the manifest/ledger agreement. */
class CurationSpec extends SparkSpec {

  private lazy val manifest =
    Curation.q228CurationManifest(spark, sf).collect()
  private lazy val ledger =
    Curation.q229CurationLedger(spark, sf).collect()

  private def stage(name: String) = manifest.find(_.getString(1) == name).get

  test("manifest has the 8 stages in order") {
    assert(manifest.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(manifest.map(_.getString(1)).toSeq == Seq("ingest",
      "quality_screen", "exact_dedup", "near_dedup", "decontaminate",
      "mix_reweight", "pack", "shard_export"))
  }

  test("the chain is consistent: each stage consumes the previous survivors") {
    (1 until 6).foreach { i =>
      assert(manifest(i).getLong(3) == manifest(i - 1).getLong(4),
        s"stage ${i + 1} n_in != stage $i n_out")
      assert(manifest(i).getLong(5) == manifest(i - 1).getLong(6),
        s"stage ${i + 1} tokens_in != stage $i tokens_out")
    }
    // pack and shard_export both account over the post-mix multiset
    assert(stage("pack").getLong(3) == stage("mix_reweight").getLong(4))
    assert(stage("shard_export").getLong(3) == stage("mix_reweight").getLong(4))
  }

  test("drop accounting holds on every doc-grain stage") {
    manifest.take(5).foreach { r =>
      assert(r.getLong(7) == r.getLong(3) - r.getLong(4),
        s"${r.getString(1)}: n_dropped != n_in - n_out")
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(6) <= r.getLong(5),
        s"${r.getString(1)}: outputs exceed inputs")
    }
  }

  test("the pipeline keeps a non-trivial corpus and actually drops something") {
    assert(stage("mix_reweight").getLong(4) > 0, "empty curated corpus")
    val dropped = manifest.take(5).map(_.getLong(7)).sum
    assert(dropped > 0, "fixtures plant duplicates; the chain must drop some")
  }

  test("ledger outcomes partition the corpus and match the manifest counts") {
    val byOutcome = ledger.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val n0 = stage("ingest").getLong(3)
    assert(byOutcome.values.sum == n0)
    assert(byOutcome.getOrElse("low_quality", 0) ==
      stage("quality_screen").getLong(7))
    assert(byOutcome.getOrElse("exact_duplicate", 0) ==
      stage("exact_dedup").getLong(7))
    assert(byOutcome.getOrElse("near_duplicate", 0) ==
      stage("near_dedup").getLong(7))
    assert(byOutcome.getOrElse("eval_leak", 0) ==
      stage("decontaminate").getLong(7))
    assert(byOutcome.getOrElse("mix_thinned", 0) ==
      stage("mix_reweight").getLong(7))
    // kept docs carry ≥1 copy; every dropped doc carries 0
    assert(ledger.filter(_.getString(1) == "kept").forall(_.getLong(4) >= 1))
    assert(ledger.filter(r => r.getString(1) != "kept")
      .forall(_.getLong(4) == 0))
  }

  test("near-dup stage drops only pair-graph members, never a group's last survivor") {
    val labels = Dedup.minLabelComponents(
        spark, Dedup.q27MinhashLsh(spark, sf).select("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDropped = ledger.filter(_.getString(1) == "near_duplicate")
      .map(_.getLong(0)).toSet
    assert(nearDropped.forall(labels.contains),
      "a non-graph doc was dropped as a near-duplicate")
  }

  test("mix stage conserves mass within the rounding regime") {
    val mix = stage("mix_reweight")
    val (n5, n6) = (mix.getLong(3), mix.getLong(4))
    // temperature resampling targets sum(copies) = K = n5; floor+hash
    // rounding keeps it within a few % on any non-degenerate corpus
    assert(math.abs(n6 - n5) <= math.max(5L, n5 / 10),
      s"mix multiset $n6 far from target $n5")
  }

  test("pack capacity bounds: sequences cover the packed tokens") {
    val pk = stage("pack")
    val (t6, nSeq, tOut) = (pk.getLong(5), pk.getLong(4), pk.getLong(6))
    assert(tOut == nSeq * Sampling.SeqBudget)
    assert(tOut >= t6, "sequence slots cannot hold the token mass")
    // ceil-division tightness: padding < one budget per pack shard
    assert(tOut - t6 < Sampling.SeqBudget * Sampling.PackShards)
  }

  test("shard export stays within the configured fan-out") {
    val sh = stage("shard_export")
    assert(sh.getLong(4) >= 1 && sh.getLong(4) <= Sampling.ExportShards)
  }

  test("quality screen agrees with the standalone q23 low tier") {
    val lowQ = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.operators.TextOps.tokens(coalesce(col("text"), lit(""))).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        round((least(size(col("w")).cast("double") / 100.0, lit(1.0)) * 0.5 +
          size(array_distinct(col("w"))).cast("double") / size(col("w")) * 0.5)
          * 10000).cast("long").as("q"))
      .filter(col("q") < Curation.QualityFloorMicro)
      .count()
    assert(ledger.count(_.getString(1) == "low_quality") == lowQ)
  }

  test("q247 export reconciles with the q228 manifest and the q72 link audit") {
    val manifest = Curation.q228CurationManifest(spark, sf).collect()
    def st(n: String) = manifest.find(_.getString(1) == n).get
    val export = Curation.q247TrainingExport(spark, sf).collect()
    // every exported record is an alive5 survivor with copies > 0: the
    // export's record count = the mix stage's input minus its thinned
    // docs, and the weighted token mass = the manifest's tokens_out
    val nRecords = export.map(_.getLong(1)).sum
    val expRecords = st("mix_reweight").getLong(3) - st("mix_reweight").getLong(7)
    assert(nRecords == expRecords,
      s"export records $nRecords != manifest survivors $expRecords")
    assert(export.map(_.getLong(3)).sum == st("mix_reweight").getLong(6),
      "weighted token mass != manifest mix tokens_out")
    // the export's shard set is exactly the manifest's shard count
    assert(export.length.toLong == st("shard_export").getLong(4),
      "export shard count != manifest shard_export n_out")
    // embedding linkage: the fixture is 1:1 on vec ids, so every record
    // whose doc_id has a vector is counted — bounded by records
    export.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= r.getLong(1))
      assert(r.getLong(5) >= 0 && r.getLong(5) <= r.getLong(1))
    }
    // the checksum discriminates: shards with records carry non-zero sums
    export.foreach { r =>
      assert(r.getLong(1) == 0 || r.getLong(6) > 0,
        s"shard ${r.getLong(0)} has a zero checksum")
    }
  }
}
