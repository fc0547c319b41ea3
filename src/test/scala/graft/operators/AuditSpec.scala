package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("healthy corpus audits to an all-zero report with all issue classes present") {
    val rows = Audit.q72IntegrityAudit(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set(
      "doc_missing_embedding", "embedding_orphan", "embedding_nan",
      "embedding_zero_norm", "embedding_dim_mismatch", "empty_text", "null_lang"))
    assert(rows.forall(_.getLong(1) == 0L), s"expected clean: ${rows.mkString(",")}")
  }

  test("every issue class is detected on a planted dirty fixture") {
    val docs = Seq(
      (1L, "fine text", "en"),
      (2L, "   ", "en"),      // empty after trim
      (3L, "fine too", ""),   // missing lang
      (9L, "no embedding", "en")
    ).toDF("doc_id", "text", "lang")
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(Float.NaN, 1.0f)),          // NaN component
      (3L, Array(0.0f, 0.0f)),               // zero vector
      (7L, Array(1.0f, 1.0f)),               // orphan (no doc 7)
      (4L, Array(1.0f, 2.0f, 3.0f))          // wrong dim AND orphan
    ).toDF("vec_id", "embedding")
    val got = Audit.integrity(docs, emb, expectedDim = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("empty_text") == 1)
    assert(got("null_lang") == 1)
    assert(got("embedding_nan") == 1)
    assert(got("embedding_zero_norm") == 1)
    assert(got("embedding_dim_mismatch") == 1)
    assert(got("doc_missing_embedding") == 1) // doc 9
    assert(got("embedding_orphan") == 2)      // vecs 7 and 4
  }

  test("boilerplate report finds shingles planted across many documents") {
    val marker = "lorem ipsum dolor"
    val docs = (0L until 10L).map { i =>
      (i, s"unique$i words here $marker tail$i", "en", "s", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val rows = TextOps.q73Boilerplate(spark, tmp).collect()
    // the marker and its two cross-boundary neighbors span all 10 docs
    val full = rows.filter(_.getLong(1) == 10L).map(_.getString(0)).toSet
    assert(full.contains(marker), s"planted 3-gram must be reported: $full")
    assert(rows.head.getLong(1) == 10L, "full-coverage shingles rank first")
    val markerRow = rows.find(_.getString(0) == marker).get
    assert(markerRow.getLong(2) == 0L, "first_doc is the minimum doc_id")
    assert(rows.forall(_.getLong(1) >= TextOps.BoilerMinDocs))
  }

  test("q163: pair counts replay driver-side; matrix is symmetric-consistent") {
    // driver-side replay of all four flags from raw text + the engine's
    // own q78 surprisal key (integer, so exact)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val toks = docs.map { case (d, t) => d -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val filler = graft.operators.Classify.FillerTokens.toSet
    val cnt = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = toks.values.map(_.size.toLong).sum
    val mb = cnt.view.mapValues(c =>
      math.round(-(math.log(c.toDouble / nTotal) / math.log(2)) * 1e6)).toMap
    val bits = toks.collect { case (d, ts) if ts.nonEmpty =>
      d -> math.floor((2.0 * ts.map(mb).sum + 100 * ts.length) / (200.0 * ts.length)).toLong
    }
    val mu = math.floor((bits.values.sum * 2.0 + bits.size) / (bits.size * 2)).toLong
    val flags = docs.map { case (d, _) =>
      val ts = toks(d)
      Map(
        "filler" -> (ts.count(filler) * graft.operators.Classify.FillerMax > ts.length),
        "repetition" -> ((ts.length - ts.distinct.length) * 3 >= ts.length * 2),
        "short" -> (ts.length < 25),
        "lm_tail" -> bits.get(d).exists(_ > mu))
    }
    val rows = Audit.q163FilterCorrelation(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (na, nb, both) =
        (flags.count(_(a)).toLong, flags.count(_(b)).toLong,
          flags.count(f => f(a) && f(b)).toLong)
      assert(r.getLong(2) == docs.length.toLong)
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((na, nb, both)), s"pair ($a,$b)")
      val union = na + nb - both
      val jac = if (union == 0) 0L else both * 1000000L / union
      assert(r.getLong(6) == jac, s"pair ($a,$b) jaccard")
      assert(both <= math.min(na, nb), "intersection bounded by both sets")
    }
  }

  test("q150: dashboard columns reconcile with the family queries they summarize") {
    val out = Audit.q150CurationDashboard(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(out.map(_._2).sum == nDocs, "sources must partition the corpus")
    // exact-dup column = total members of q24's duplicate groups
    val q24Copies = graft.operators.Dedup.q24DedupExact(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(out.map(_._3).sum == q24Copies, "exact-dup total != q24 group members")
    // near-dup column = distinct docs in the q26 pair set
    val q26Docs = graft.operators.Dedup.q26NgramJaccard(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length
    assert(out.map(_._4).sum == q26Docs.toLong, "near-dup total != q26 docs")
    // sem-dup column = distinct vectors in the q31 pair set
    val q31Docs = graft.operators.Similarity.q31CosineNearDup(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length
    assert(out.map(_._6).sum == q31Docs.toLong, "sem-dup total != q31 vectors")
    // flags never exceed the source's doc count
    out.foreach { case (_, n, a, b, c, d) =>
      assert(Seq(a, b, c, d).forall(f => f >= 0 && f <= n))
    }
  }

  test("q246: planted missing assets and orphans are counted exactly") {
    val out = graft.operators.Audit.q246CrossModalAudit(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.core.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions.col
    val expMissing = docs.filter(
      col("doc_id") % graft.operators.Audit.MissingAssetMod ===
        graft.operators.Audit.MissingAssetRem).count()
    val expOrphan = docs.filter(
      col("doc_id") % graft.operators.Audit.OrphanAssetMod ===
        graft.operators.Audit.OrphanAssetRem).count()
    assert(expMissing > 0 && expOrphan > 0, "planted rules must fire at every SF")
    assert(out("doc_missing_asset") === expMissing)
    assert(out("asset_orphan") === expOrphan)
    // audio/video stores: same anti-join machinery, distinct moduli —
    // each modality's count must equal ITS OWN planted slice
    def planted(mod: Long, rem: Long): Long =
      docs.filter(col("doc_id") % mod === rem).count()
    val expectByIssue = Map(
      "doc_missing_audio" ->
        planted(graft.operators.Audit.MissingAudioMod, graft.operators.Audit.MissingAudioRem),
      "audio_orphan" ->
        planted(graft.operators.Audit.OrphanAudioMod, graft.operators.Audit.OrphanAudioRem),
      "doc_missing_video" ->
        planted(graft.operators.Audit.MissingVideoMod, graft.operators.Audit.MissingVideoRem),
      "video_orphan" ->
        planted(graft.operators.Audit.OrphanVideoMod, graft.operators.Audit.OrphanVideoRem))
    expectByIssue.foreach { case (issue, exp) =>
      assert(exp > 0, s"$issue: planted rule must fire at every SF")
      assert(out(issue) === exp, issue)
    }
    // the six modality counts (image included) are pairwise distinct on
    // this corpus — a cross-modality misattribution cannot pass
    val allSix = expectByIssue.values.toSeq ++ Seq(expMissing, expOrphan)
    assert(allSix.distinct.size === 6, s"counts not distinct: $allSix")
    assert(out.keySet === Set(
      "doc_missing_asset", "asset_orphan",
      "doc_missing_audio", "audio_orphan",
      "doc_missing_video", "video_orphan",
      "dup_image_distinct_caption"))
  }

  test("q246: distinct-caption count rides the keeper grain of the real dHash clusters") {
    val out = graft.operators.Audit.q246CrossModalAudit(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions._
    // independent recount: clusters via the REAL codec chain on the
    // present slice; the flagged count can never exceed the non-keeper
    // member count, and on this fixture (distinct texts per doc) it
    // must flag at least one member
    val dh = graft.operators.Multimodal.dHashImages(
      graft.operators.Multimodal.imageAssets(spark, sf)
        .filter(col("doc_id") % graft.operators.Audit.MissingAssetMod =!=
          graft.operators.Audit.MissingAssetRem)).toDF()
    val nonKeepers = dh.groupBy("h_hi", "h_lo")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .agg(sum(col("n") - 1)).collect()(0).getLong(0)
    val flagged = out("dup_image_distinct_caption")
    assert(flagged > 0, "fixture clusters carry distinct captions by construction")
    assert(flagged <= nonKeepers,
      s"flagged $flagged exceeds the $nonKeepers non-keeper members")
  }

  test("q246: the cross_modal_audit() TVF body equals the dir query row-for-row") {
    val dir = graft.operators.Audit.q246CrossModalAudit(spark, sf)
    val tvf = graft.operators.Audit.tableCrossModal(
      spark, graft.core.Tables.documents(spark, sf))
    assert(tvf.exceptAll(dir).isEmpty && dir.exceptAll(tvf).isEmpty,
      "table-derived audit diverged from the staged-artifact audit")
  }
}
