package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("split assignment is deterministic, total, and roughly 90/5/5") {
    val rows = Sampling.q58SplitAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length == total, "every document gets a split")
    val frac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / total).toMap
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.90) < 0.06, s"train ${frac}")
    assert(frac.getOrElse("val", 0.0) < 0.12 && frac.getOrElse("test", 0.0) < 0.12)
    // deterministic: a second run assigns identically
    val again = Sampling.q58SplitAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.toSeq == again.toSeq)
    // content-keyed: identical text ⇒ identical split (duplicate docs)
    import org.apache.spark.sql.functions._
    val splitsPerContent = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(trim(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byFp = rows.groupBy { case (id, _) => splitsPerContent(id) }
    byFp.values.foreach(g => assert(g.map(_._2).distinct.length == 1,
      "same content must never straddle splits"))
  }

  test("quality-weighted sample keeps all high-tier docs and thins the tail") {
    val kept = Sampling.q60QualitySample(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(kept.nonEmpty)
    val tierTotals = TextOps.q23QualityScore(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByTier = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // 100% keep-rate tier is kept in full; thinned tiers keep strictly
    // fewer (rates are 50/10% — at corpus sizes a full keep is
    // astronomically unlikely, so a strict check catches a broken filter)
    assert(keptByTier.getOrElse("high", 0L) == tierTotals.getOrElse("high", 0L))
    Seq("medium", "low").foreach { tier =>
      val total = tierTotals.getOrElse(tier, 0L)
      if (total > 20) assert(keptByTier.getOrElse(tier, 0L) < total, s"$tier not thinned")
    }
    // deterministic
    val again = Sampling.q60QualitySample(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(kept.toSeq == again.toSeq)
  }

  test("per-source cap keeps at most the quota, deterministically") {
    val rows = Sampling.q59SourceCap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_._2)
    bySource.foreach { case (src, g) =>
      assert(g.length <= Sampling.SourceCap, s"source $src over quota")
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq, s"ranks contiguous for $src")
    }
    // sources with fewer docs than the cap keep everything
    val counts = graft.core.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (src, n) =>
      assert(bySource.get(src).map(_.length).getOrElse(0) == math.min(n, Sampling.SourceCap.toLong))
    }
  }

  test("sequence packing assigns every doc once with in-budget offsets") {
    val rows = Sampling.q63SequencePack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length == total, "every document starts in exactly one sequence")
    rows.foreach { case (id, shard, seq, off) =>
      assert(off >= 0 && off < Sampling.SeqBudget, s"doc $id offset $off out of budget")
      assert(shard >= 0 && shard < Sampling.PackShards && seq >= 0)
    }
    // packing is tight: within a shard, consecutive docs (in pack order)
    // start exactly prev_start + prev_tokens into the token stream
    val again = Sampling.q63SequencePack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq, "deterministic across runs")
  }

  test("temperature mix conserves corpus size and flattens the source distribution") {
    val rows = Sampling.q64TemperatureMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length == n, "one decision row per doc")
    val copies = rows.map(_._3).sum
    // K is preserved in expectation; hash rounding keeps it within a few %
    assert(math.abs(copies - n).toDouble / n < 0.1, s"total copies $copies vs corpus $n")
    val bySource = rows.groupBy(_._2).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    val (bigSrc, (bigN, bigCopies)) = bySource.maxBy(_._2._1)
    val (smallSrc, (smallN, smallCopies)) = bySource.minBy(_._2._1)
    if (bigN > smallN * 2) {
      // α < 1: the dominant source is thinned below 1×, the smallest is
      // repeated above 1× — the whole point of temperature sampling
      assert(bigCopies.toDouble / bigN < 1.0, s"$bigSrc should downsample")
      assert(smallCopies.toDouble / smallN > 1.0, s"$smallSrc should upsample")
    }
  }

  test("temperature mix realizes fractional repetition rates, not their ceiling") {
    import spark.implicits._
    // Skewed fixture chosen so frac(rep_s) lands mid-range for every
    // source (≈0.2–0.9, nothing near 0) — the regime where a compressed
    // uniform draw (the 16-bit-numerator / 1e6-denominator bug this test
    // pins) rounds EVERY doc up to ceil(rep) instead of a frac(rep)
    // share of them.
    val docs = ((1 to 800).map(i => (i.toLong, "big", s"alpha payload $i text body")) ++
      (801 to 950).map(i => (i.toLong, "mid", s"beta payload $i text body")) ++
      (951 to 1030).map(i => (i.toLong, "small", s"gamma payload $i text body")))
      .toDF("doc_id", "source", "text")
    val alpha = 0.7
    val rows = Sampling.temperatureMix(docs, alpha).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sizes = Map("big" -> 800L, "mid" -> 150L, "small" -> 80L)
    val wTot = sizes.values.map(n => math.pow(n.toDouble, alpha)).sum
    val kTot = sizes.values.sum.toDouble
    val bySource = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    sizes.foreach { case (src, n) =>
      val rep = BigDecimal(kTot * math.pow(n.toDouble, alpha) / (wTot * n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val frac = rep - math.floor(rep)
      assert(frac > 0.1 && frac < 0.95, s"fixture degenerate for $src: frac=$frac")
      val expected = n * rep
      // binomial tolerance on the fractional-copy count; the ceil-rounding
      // bug overshoots by n·(1-frac) — an order of magnitude outside it
      val tol = 4 * math.sqrt(n * frac * (1 - frac)) + 2
      val got = bySource(src).toDouble
      assert(math.abs(got - expected) <= tol,
        s"$src: realized $got copies vs target $expected (rep=$rep, tol=$tol)")
    }
  }

  test("per-source quota is skew-safe: bounded survivors, output = naive window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cap = 7
    // one source owns 90% of the corpus — the regime a quota op exists for
    val docs = ((1 to 900).map(i => (i.toLong, "dominant", s"doc text $i payload")) ++
      (901 to 1000).map(i => (i.toLong, s"tail_${i % 10}", s"doc text $i payload")))
      .toDF("doc_id", "source", "text")
    // the skew guarantee: rows reaching the rank window are ≤ cap per
    // source regardless of the input distribution — the dominant source
    // was reduced map-side by the bounded kth_smallest threshold, never
    // sorted whole on one reducer
    val surv = Sampling.capSurvivors(docs, cap)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(surv("dominant") == cap.toLong, "dominant source must pre-reduce to exactly cap rows")
    assert(surv.values.forall(_ <= cap.toLong))
    // semantics unchanged: identical to the naive single-window top-k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(md5(trim(col("text"))), col("doc_id"))
    val reference = docs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap)
      .select(col("doc_id"), col("source"), col("rnk").cast("long").as("rnk"))
      .orderBy("source", "rnk").collect().toSeq
    val actual = Sampling.sourceCap(docs, cap).collect().toSeq
    assert(actual == reference)
  }

  test("q106 weighted sample: long docs over-represented, top-k plan, ES property") {
    import org.apache.spark.sql.functions._
    val df = Sampling.q106WeightedSample(spark, sf)
    val rows = df.collect()
    assert(rows.length == Sampling.WeightedSampleK)
    // weighting by length must pull the sample mean above the corpus mean
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = graft.core.Tables.documents(spark, sf)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean vs corpus $corpusMean")
    // selection is by the ES key: every selected key >= every rejected key
    val all = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        (log((conv(substring(md5(trim(col("text"))), 9, 6), 16, 10)
            .cast("long") + 1) / 16777216.0)
          / greatest(col("n_chars"), lit(1L)).cast("double")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val chosen = rows.map(_.getLong(0)).toSet
    val minChosen = chosen.map(all).min
    val maxRejected = (all.keySet -- chosen).map(all).max
    assert(minChosen >= maxRejected)
    // top-k, not a global sort
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("TakeOrderedAndProject"), s"q106 must plan top-k\n$plan")
  }

  test("mix manifest: temperature shares and epoch factors in integer micros") {
    import spark.implicits._
    val docs = Seq(
      (0L, "A", 300L), (1L, "A", 100L), (2L, "B", 100L))
      .toDF("doc_id", "source", "n_tok")
    val out = Sampling.mixManifest(docs, alpha = 0.7, budget = 100L).collect()
    val (wa, wb) = (math.pow(400, 0.7), math.pow(100, 0.7))
    val wt = wa + wb
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq(
        ("A", 400L, math.round(wa * 1000000 / wt), math.round(100 * wa * 1000000 / (wt * 400))),
        ("B", 100L, math.round(wb * 1000000 / wt), math.round(100 * wb * 1000000 / (wt * 100)))))
    // α < 1 flattens: the 4x-bigger source gets a sub-proportional share
    assert(out(0).getLong(2) < 800000L && out(0).getLong(2) > 500000L)
  }

  test("token-budget fill admits the doc_id-order prefix per source, exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, "A", 50L), (1L, "A", 60L), (2L, "A", 70L), (3L, "B", 100L))
      .toDF("doc_id", "source", "n_tok")
    val out = Sampling.tokenBudgetFill(docs, budget = 120L).collect()
    // A: 50, 110 admitted, 180 over; B: 100 admitted
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq ==
      Seq((0L, "A", 50L), (1L, "A", 110L), (3L, "B", 100L)))
  }

  test("shard manifest: conserves corpus mass, shards in range, deterministic") {
    import org.apache.spark.sql.functions._
    val rows = Sampling.q128ShardManifest(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < Sampling.ExportShards))
    val docs = graft.core.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "every doc lands in exactly one shard")
    assert(rows.map(_.getLong(3)).sum ==
      docs.agg(sum("n_chars")).head().getLong(0), "byte mass conserved")
    // content-keyed: a re-run (fresh plan) lands on the identical manifest
    val again = Sampling.q128ShardManifest(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("DSIR: target-like raw docs outrank target-unlike; target docs never selected") {
    import spark.implicits._
    // bucket space crafted directly (the generic entry takes feature
    // occurrences): target domain lives in buckets {1,2}; raw doc 10
    // shares them, raw doc 11 uses disjoint {3,4}, raw doc 12 mixes
    val feats = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L),   // target doc 1
      (2L, 1L), (2L, 2L), (2L, 2L),   // target doc 2
      (10L, 1L), (10L, 2L), (10L, 1L), // raw, target-like
      (11L, 3L), (11L, 4L), (11L, 3L), // raw, target-unlike
      (12L, 1L), (12L, 3L)             // raw, mixed
    ).toDF("doc_id", "bucket")
    val srcs = Seq((1L, "tgt"), (2L, "tgt"), (10L, "raw"), (11L, "raw"),
      (12L, "raw")).toDF("doc_id", "source")
    val out = Sampling.dsirSelect(feats, srcs, Seq("tgt"), nBuckets = 8L,
      topK = 10).collect()
    val byDoc = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byDoc.keySet == Set(10L, 11L, 12L), "only raw-pool docs selectable")
    assert(byDoc(10L) > byDoc(12L) && byDoc(12L) > byDoc(11L),
      "ranking follows target-likeness")
    assert(byDoc(10L) > 0 && byDoc(11L) < 0,
      "target-like weight positive, target-unlike negative")
    // ranked output: descending weight
    val weights = out.map(_.getLong(3)).toSeq
    assert(weights == weights.sorted.reverse)
  }

  test("q129 on the fixture corpus: 30 rows, no target-source docs, deterministic") {
    val rows = Sampling.q129DsirSelect(spark, sf).collect()
    assert(rows.length == Sampling.DsirTopK)
    assert(rows.forall(r => !Sampling.DsirTargetSources.contains(r.getString(1))),
      "selection draws from the raw pool only")
    val again = Sampling.q129DsirSelect(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("exportShards: the manifest re-derived from written files equals the plan") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (i, (1 to 12).map(j => s"tok${i}_$j").mkString(" "), 60L + i, 12L)
    }.toDF("doc_id", "text", "n_chars", "n_tok")
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString
    val written = Sampling.exportShards(spark, docs, nShards = 4L, out).collect()
    val planned = Sampling.shardManifest(docs, nShards = 4L).collect()
    assert(written.map(_.toString).toSeq == planned.map(_.toString).toSeq,
      "a consumer holding only the export re-derives the published manifest")
    // the write really fanned out by shard directory
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(shardDirs.nonEmpty && shardDirs.subsetOf(
      (0 until 4).map(i => s"shard=$i").toSet))
  }

  test("q146: packing sweep reconciles with q63's cut points; nested budgets are monotone") {
    val out = Sampling.q146PackingSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Sampling.PackSweepBudgets)
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(out.forall(_._2 == nDocs), "every budget covers the whole corpus")
    // reconcile the SeqBudget row against q63's emitted offsets: a doc
    // crosses a boundary iff its offset + length reaches past the cut
    val toks = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.operators.TextOps.tokens(
            org.apache.spark.sql.functions.col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q63 = Sampling.q63SequencePack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val expectedSplit = q63.count { case (d, off) =>
      toks(d) > 0 && off + toks(d) - 1 >= Sampling.SeqBudget
    }
    val atBudget = out.find(_._1 == Sampling.SeqBudget).get
    assert(atBudget._3 == expectedSplit,
      s"split count ${atBudget._3} != q63-derived $expectedSplit")
    // nested budgets (128 | 256 | 512): splits and sequences both shrink
    // as the context grows
    assert(out.map(_._3).toSeq == out.map(_._3).sortBy(-_).toSeq, "splits not monotone")
    assert(out.map(_._4).toSeq == out.map(_._4).sortBy(-_).toSeq, "sequences not monotone")
    out.foreach { case (_, nd, ns, _, pct) =>
      assert(math.abs(pct - (ns * 1000000L / nd) / 10000.0) < 1e-9)
    }
  }

  test("q233: cluster-safe split is group-consistent, leak-free, and a strict q58 refinement") {
    import org.apache.spark.sql.functions.col
    val assigned = Sampling.q233ClusterSafeSplit(spark, sf)
    val rows = assigned.collect()
    // one split per group — the defining property
    rows.groupBy(_.getLong(1)).foreach { case (g, members) =>
      assert(members.map(_.getString(2)).distinct.length == 1,
        s"group $g straddles splits")
    }
    // ZERO cross-split near-dup leakage: the q123 audit over THIS
    // assignment must be empty (a >=0.6 pair is an edge of the closure
    // the split is drawn on)
    val leaks = Dedup.splitLeakage(
      Dedup.q27MinhashLsh(spark, sf),
      assigned.select(col("doc_id"), col("split")))
    assert(leaks.count() == 0, "cluster-safe split leaked a near-dup pair")
    // strict refinement: docs outside the pair graph keep their q58 draw
    val naive = Sampling.q58SplitAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val inGraph = Dedup.q38DedupApply(spark, sf).collect().map(_.getLong(0)).toSet
    rows.filterNot(r => inGraph(r.getLong(0))).foreach { r =>
      assert(r.getString(2) == naive(r.getLong(0)),
        s"non-graph doc ${r.getLong(0)} changed split")
    }
    // and the distribution stays roughly 90/5/5
    val n = rows.length.toDouble
    val train = rows.count(_.getString(2) == "train") / n
    assert(train > 0.8 && train < 0.97, s"train share $train implausible")
  }

  test("q227: replicate 0 equals an exact driver replay of the Poisson draws") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
    val toks = TextOps.tokens(col("text"))
    // the draw seeds from doc_id (round-11 advisor item: text-seeded
    // draws make byte-identical duplicates resample as a block)
    val scored = docs.filter(size(toks) > 0)
      .select(
        round((least(size(toks).cast("double") / 100.0, lit(1.0)) * 0.5 +
          size(array_distinct(toks)).cast("double") / size(toks) * 0.5) * 10000)
          .cast("long").as("q"),
        col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def draw(docId: Long, r: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId:bs$r".getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(d.take(3).map("%02x".format(_)).mkString, 16)
      val k = Sampling.PoissonCdf24.indexWhere(u < _)
      if (k < 0) Sampling.PoissonCdf24.length.toLong else k.toLong
    }
    val ws = scored.map { case (q, id) => (q, draw(id, 0)) }
    val nEff = ws.map(_._2).sum
    val mean = (BigInt(100) * ws.map { case (q, w) => BigInt(q * w) }.sum /
      BigInt(math.max(nEff, 1L))).toLong
    val got = Sampling.q227BootstrapCi(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(0L) == ((nEff, mean)),
      s"replicate 0: engine ${got(0L)} vs driver replay ($nEff, $mean)")
    // statistical sanity: Poisson(1) weights resample to ~the corpus
    // size, and the baseline sits inside the replicate spread
    val reps = got.filter(_._1 >= 0).values.toSeq
    val n = got(-1L)._1
    assert(reps.forall { case (ne, _) => ne > n / 2 && ne < n * 2 })
    val means = reps.map(_._2.toDouble)
    val mu = means.sum / means.length
    val sd = math.sqrt(means.map(m => (m - mu) * (m - mu)).sum / (means.length - 1))
    assert(math.abs(got(-1L)._2 - mu) <= 4 * math.max(sd, 1.0),
      "baseline mean outside the replicate spread")
  }

  test("q236: waterfill grants are monotone, capped, conserved, and replay driver-side") {
    val rows = Sampling.q236BudgetWaterfill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getLong(7)))
    // per-source invariants: rounds only add, nothing exceeds capacity,
    // the saturated flag is exactly grant = capacity
    rows.foreach { case (src, avail, _, g1, g2, g3, sat, fill) =>
      assert(0L <= g1 && g1 <= g2 && g2 <= g3 && g3 <= avail, src)
      assert(sat === (g3 == avail), src)
      assert(fill === 1000000L * g3 / math.max(avail, 1L), src)
    }
    // both regimes fire on the fixture (the reason the weights exist)
    assert(rows.exists(_._7) && rows.exists(!_._7),
      "fixture must exercise saturation AND spill absorption")
    // conservation: the budget is never exceeded
    val total = rows.map(_._2).sum
    val budget = total * 9 / 10
    assert(rows.map(_._6).sum <= budget)
    // from-scratch driver replay of the three rounds
    var g = rows.map(r => (r._1, 0L)).toMap
    val avail = rows.map(r => r._1 -> r._2).toMap
    val w = rows.map(r => r._1 -> r._3).toMap
    val traj = (1 to Sampling.WaterfillRounds).map { _ =>
      val wActive = rows.collect { case r if g(r._1) < avail(r._1) => w(r._1) }.sum
      val remaining = budget - g.values.sum
      g = g.map { case (s, cur) =>
        val add = if (cur < avail(s))
          math.min(remaining * w(s) / math.max(wActive, 1L), avail(s) - cur)
        else 0L
        s -> (cur + add)
      }
      g
    }
    rows.foreach { case (src, _, _, g1, g2, g3, _, _) =>
      assert((g1, g2, g3) === ((traj(0)(src), traj(1)(src), traj(2)(src))), src)
    }
  }
}
