package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {

  test("bestMatch links edited recrawls and ignores unrelated content") {
    import spark.implicits._
    val reg = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "completely different registry content about database engines"),
      (12L, "another unrelated registry entry on storage formats and scans"))
      .toDF("old_id", "text")
    val crawl = Seq(
      // exact recrawl of 10
      (20L, "the quick brown fox jumps over the lazy dog again and again"),
      // edited recrawl of 11 (suffix appended — shingle overlap stays high)
      (21L, "completely different registry content about database engines updated"),
      // a birth: matches nothing
      (22L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq"))
      .toDF("new_id", "text")
    val got = Linkage.bestMatch(reg, crawl).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(20L)._1 == 10L && got(20L)._2 == 1000000L,
      "exact recrawl links at jaccard 1.0")
    assert(got(21L)._1 == 11L && got(21L)._2 >= Linkage.LinkTauMicro,
      "edited recrawl still links to its registry row")
    assert(!got.contains(22L), "births emit no link row")
  }

  test("q213 ground-truth audit: shared unchanged docs all link correctly") {
    val out = Linkage.q213RecordLinkage(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // rows are unique per new doc (top-1 semantics)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // every shared UNCHANGED doc must link (jaccard 1.0 with its twin
    // always passes τ); is_true can be false only where the corpus'
    // planted near-duplicates make another registry row tie-equal
    import Corpus._
    val docs = graft.core.Tables.documents(spark, sf)
    val shared = docs.filter(
      col("doc_id") % RemovedInV2Mod =!= RemovedInV2Rem &&
        col("doc_id") % DroppedFromV1Mod =!= DroppedFromV1Rem)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val linked = rows.map(_.getLong(0)).toSet
    assert(shared.subsetOf(linked),
      s"shared docs missing a link: ${(shared -- linked).take(5)}")
    // precision floor: the overwhelming majority of links must be true
    val nTrue = rows.count(_.getBoolean(4))
    assert(nTrue.toDouble / rows.length >= 0.9,
      s"linkage precision ${nTrue.toDouble / rows.length} below 0.9")
  }

  test("prefix-filtered candidates reproduce the unpruned blocking answer") {
    // lossless-pruning property on the real corpus: the τ-passing link
    // set from bestMatch (prefix filter) equals the plain blocked join
    val reg = SnapshotFixture.table(spark, sf, "documents_v1_growth")
      .select(col("doc_id").as("old_id"), col("text"))
    val crawl = SnapshotFixture.table(spark, sf, "documents_v2")
      .select(col("doc_id").as("new_id"), col("text"))
    val pruned = Linkage.bestMatch(reg, crawl)
      .select("new_id", "old_id", "jac_micro").collect().toSet

    val plain = {
      val r = Dedup.sigsOf(reg.select(col("old_id").as("doc_id"), col("text")))
        .select(col("doc_id").as("old_id"), explode(col("hs")).as("h"), col("n_sh").as("n_r"))
      val n = Dedup.sigsOf(crawl.select(col("new_id").as("doc_id"), col("text")))
        .select(col("doc_id").as("new_id"), explode(col("hs")).as("h"), col("n_sh").as("n_n"))
      n.join(r, Seq("h"))
        .groupBy("new_id", "old_id", "n_n", "n_r")
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter") * lit(1000000L) >=
          lit(Linkage.LinkTauMicro) * (col("n_n") + col("n_r") - col("inter")))
        .withColumn("jac_micro", expr("(1000000 * inter) div (n_n + n_r - inter)"))
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("new_id")
            .orderBy(desc("jac_micro"), col("old_id"))))
        .filter(col("rk") === 1)
        .select("new_id", "old_id", "jac_micro").collect().toSet
    }
    assert(pruned == plain, "prefix filtering changed the link set")
  }

  test("tieredLink: exact copies resolve in tier 1, edits in tier 2, births nowhere") {
    import spark.implicits._
    val reg = Seq(
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "other registry content entirely different words appear here now"))
      .toDF("old_id", "text")
    val crawl = Seq(
      (20L, "one two three four five six seven eight nine ten"),   // exact
      (21L, "other registry content entirely different words appear here now updated"), // edit
      (22L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq"))            // birth
      .toDF("new_id", "text")
    val got = Linkage.tieredLink(reg, crawl).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(20L) == ((10L, 1000000L, "exact")))
    assert(got(21L)._1 == 11L && got(21L)._3 == "fuzzy" &&
      got(21L)._2 >= Linkage.LinkTauMicro)
    assert(!got.contains(22L))
  }

  test("q220 reconciles with q213: same assignments, cheaper route for exact rows") {
    val tiered = Linkage.q220TieredLinkage(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val flat = Linkage.q213RecordLinkage(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(tiered.keySet == flat.keySet,
      "tiering must not change WHICH docs link")
    tiered.foreach { case (newId, (oldId, jac, tier)) =>
      val (fOld, fJac) = flat(newId)
      if (tier == "fuzzy")
        assert((fOld, fJac) == ((oldId, jac)),
          s"fuzzy tier diverged from flat linkage for $newId")
      else {
        assert(jac == 1000000L)
        assert(fJac == 1000000L && fOld == oldId,
          s"exact tier elected $oldId but flat linkage elected $fOld for $newId")
      }
    }
  }
}
