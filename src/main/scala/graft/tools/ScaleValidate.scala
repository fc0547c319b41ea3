package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Beyond-fixture validation of the flagship production chains at the
  * 10× [[ScaleDataGen]] tree. Six blocks — `text_dedup`,
  * `embedding_serving`, `record_linkage`, `curation_pipeline`,
  * `incremental_ingest` (q234/q235 against the 10× store, now including
  * the within-batch near-dup gate), and `compaction_lifecycle` (a real
  * watermarked drain fragmented across 8 micro-batches, then surveyed,
  * compacted, and re-scanned). The first three in detail:
  *
  * `text_dedup` (round-9 verdict item 6): the PRODUCTION dedup
  * pipeline end-to-end — q27 (LSH-blocked, Jaccard-verified
  * pairs) → q38 (connected components + keeper election) → q171
  * (edit-distance verify tier), plus q49's IVF-bucketed embedding
  * pairs — asserting the chain's own invariants hold at that scale:
  *
  *   - sub-quadratic blocking: the verified pair list stays ≪ n²/2 (a
  *     blown-up LSH regime shows here first);
  *   - verify floor: every admitted pair sits at or above the 0.6
  *     Jaccard threshold the chain promises;
  *   - closure/election: every doc in the pair graph gets exactly one
  *     keeper, keepers are group minima (keeper ≤ doc_id everywhere),
  *     and each group's keeper claims itself;
  *   - verify-tier coverage: q171 re-scores EXACTLY the q27 pair list
  *     (same cardinality) and its tier floors hold;
  *   - embedding path: every IVF-bucketed pair clears the cosine
  *     threshold recomputed in-plan, and the pair list stays
  *     sub-quadratic in the vector count.
  *
  * `embedding_serving` (round-10 verdict item 6): the ANN serving
  * chain — q43 (in-memory IVF gate: quantizer trained at this scale,
  * recall vs the exact top-k verdict collected in-plan) → q194 (the
  * IVF-PARTITIONED layout written at this scale, layout-served
  * results row-identical to the in-memory index, probe batch pruned)
  * → q162 (the nprobe sweep's recall/monotonicity/scan-bound verdicts
  * per operating point) — plus the executed-plan fact that the
  * serving scan carries `list_id` partition filters and reads no more
  * partitions than the probed∩occupied list set.
  *
  * `record_linkage` (round 11): the q220 tiered recrawl linker at
  * 10× — one link per crawl doc, the exact tier absorbing ≥90% (the
  * md5 join, not the shingle join, pays for the unchanged mass), the
  * fuzzy tier bounded by the churn rate, and ≥90% of links true
  * against the held-out id ground truth.
  *
  * Emits one JSON line and writes `SCALE_VALIDATE.json`; exits nonzero
  * on any failed gate. Run after `ScaleDataGen`:
  * {{{
  *   sbt "runMain graft.tools.ScaleDataGen"
  *   sbt "runMain graft.tools.ScaleValidate"
  * }}}
  */
object ScaleValidate {

  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft-sf1")
    if (!new java.io.File(sf1).isDirectory) {
      System.err.println(s"[scalevalidate] $sf1 missing — run ScaleDataGen first")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-scale-validate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    class Block(val name: String) {
      val checks = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]
      val stats = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      def gate(g: String)(ok: Boolean): Unit = {
        checks(g) = ok
        if (!ok) System.err.println(s"[scalevalidate] GATE FAILED: $name/$g")
      }
      def json: String =
        s""""$name":{"stats":{${stats.map { case (k, v) => s"\"$k\":$v" }.mkString(",")}},""" +
          s""""gates":{${checks.map { case (k, v) => s"\"$k\":$v" }.mkString(",")}}}"""
    }
    val dedup = new Block("text_dedup")
    val serving = new Block("embedding_serving")
    import dedup.{gate, stats}

    val nDocs = graft.core.Tables.documents(spark, sf1).count()
    stats("n_docs") = nDocs

    // q27: the production pair list. Sub-quadratic bound: at most 20
    // pairs per document on a corpus whose planted duplication rate is
    // ~10% — orders of magnitude under n²/2; a degenerate LSH regime
    // (one giant bucket) blows straight past it.
    val pairs = graft.operators.Dedup.q27MinhashLsh(spark, sf1).cache()
    val nPairs = pairs.count()
    stats("n_pairs") = nPairs
    gate("pairs_subquadratic")(nPairs <= 20L * nDocs)
    gate("pairs_nonempty")(nPairs > 0)
    val jMin = pairs.agg(min(col("jaccard"))).collect()(0).getDouble(0)
    gate("verify_floor_0.6")(jMin >= 0.6)

    // q38: closure + keeper election over the same pair list.
    val applied = graft.operators.Dedup.q38DedupApply(spark, sf1).cache()
    val nInGraph = applied.count()
    stats("n_docs_in_pair_graph") = nInGraph
    val nClusters = applied.select("keeper").distinct().count()
    stats("n_clusters") = nClusters
    gate("keeper_is_group_min")(
      applied.filter(col("keeper") > col("doc_id")).count() == 0)
    gate("every_keeper_claims_itself")(
      applied.filter(col("is_keeper")).count() == nClusters)
    gate("graph_covers_pair_endpoints")(
      nInGraph >= pairs.select(explode(array(col("d1"), col("d2")))).distinct().count())

    // q171: the edit-verify tier re-scores EXACTLY the q27 list.
    val verified = graft.operators.Dedup.q171EditVerifiedDedup(spark, sf1).cache()
    val nVerified = verified.count()
    stats("n_edit_verified") = nVerified
    gate("verify_tier_covers_pairs")(nVerified == nPairs)
    val tierOk = verified.agg(
      sum(when(col("tier") === "near_exact" &&
        col("edit_sim_micro") < graft.operators.Dedup.EditNearExactMicros, 1L)
        .otherwise(0L)).as("bad")).collect()(0).getLong(0)
    gate("tier_floors_hold")(tierOk == 0)
    stats("n_near_exact") =
      verified.filter(col("tier") === "near_exact").count()

    // q49 production path: IVF-bucketed embedding near-dup pairs.
    val emb = graft.core.Tables.embeddings(spark, sf1)
    val nVecs = emb.count()
    stats("n_vecs") = nVecs
    val vecPairs = graft.operators.Similarity.ivfNearDupPairs(
      emb,
      graft.operators.IvfIndex.centroids(spark, sf1,
        graft.operators.Similarity.semClustersFor(nVecs)),
      graft.operators.Similarity.NearDupThreshold).cache()
    val nVecPairs = vecPairs.count()
    stats("n_vec_pairs") = nVecPairs
    gate("vec_pairs_subquadratic")(nVecPairs <= 20L * nVecs)
    // in-plan threshold recount: join the embeddings back and recompute
    // the cosine — every admitted pair must clear the floor
    val e1 = emb.select(col("vec_id").as("v1"), col("embedding").as("x1"))
    val e2 = emb.select(col("vec_id").as("v2"), col("embedding").as("x2"))
    val below = vecPairs.join(e1, Seq("v1")).join(e2, Seq("v2"))
      .filter(graft.operators.Similarity.cosine(col("x1"), col("x2"))
        < graft.operators.Similarity.NearDupThreshold)
      .count()
    gate("vec_pairs_clear_threshold")(below == 0)

    // ---- block 2: the embedding-serving chain q43 → q194 → q162 ----
    // q43: the in-memory IVF gate at this scale — quantizer trained on
    // THIS corpus (per-version cache), recall-vs-exact verdict in-plan.
    val q43row = graft.operators.Similarity.q43AnnIvf(spark, sf1).collect()(0)
    serving.stats("n_probes") = q43row.getLong(0)
    serving.stats("n_exact_results") = q43row.getLong(1)
    serving.gate("ivf_recall_ok")(q43row.getBoolean(2))

    // q194: the IVF-partitioned layout written at this scale; served
    // results must equal the in-memory index row-for-row and the probe
    // batch must prune.
    val q194row = graft.layout.IvfLayout.q194IvfLayoutServe(spark, sf1).collect()(0)
    serving.gate("layout_results_match")(q194row.getBoolean(1))
    serving.gate("layout_pruned")(q194row.getBoolean(2))
    serving.gate("layout_scan_bounded")(q194row.getBoolean(3))

    // executed-plan fact (the IvfLayoutSpec check, at 10×): the serving
    // scan carries list_id partition filters and reads no more
    // partitions than the probed∩occupied list set
    val servedDf = graft.layout.IvfLayout.servedTopK(spark, sf1)
    servedDf.collect()
    val planStr = servedDf.queryExecution.executedPlan.toString
    serving.gate("scan_has_partition_filters")(
      planStr.contains("PartitionFilters") && planStr.contains("list_id"))
    val probedLists = graft.layout.IvfLayout.probedLists(spark, sf1).toSet
    val layoutRoot = graft.layout.IvfLayout.ensure(spark, sf1)
    val occupied = Option(new java.io.File(layoutRoot).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
      .map(_.getName.stripPrefix("list_id=").toInt).toSet
    val scannedParts = servedDf.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics.get("numPartitions").map(_.value)
      }.flatten
    serving.stats("n_lists_probed") = probedLists.size.toLong
    serving.stats("n_lists_occupied") = occupied.size.toLong
    scannedParts.foreach(p => serving.stats("n_partitions_scanned") = p)
    serving.gate("scan_reads_only_probed")(
      scannedParts.forall(_ <= (probedLists & occupied).size))

    // q162: every operating point's recall / monotonicity / scan-bound
    // verdicts hold at this scale
    val sweepRows = graft.operators.Similarity.q162NprobeSweep(spark, sf1).collect()
    serving.stats("n_sweep_points") = sweepRows.length.toLong
    serving.gate("sweep_all_verdicts")(sweepRows.nonEmpty && sweepRows.forall { r =>
      r.getBoolean(r.fieldIndex("recall_ok")) &&
        r.getBoolean(r.fieldIndex("monotone_ok")) &&
        r.getBoolean(r.fieldIndex("scan_bounded_ok"))
    })

    // ---- block 3: the record-linkage chain q220 at 10× ----
    // the tiered linker against the snapshot registry at this scale:
    // the exact tier must absorb the unchanged mass, the fuzzy tier
    // must ride the churn, and the held-out ground truth bounds
    // precision — the invariants that make linkage affordable at a
    // 100 TB recrawl.
    val linkage = new Block("record_linkage")
    locally {
      import graft.operators.Corpus._
      val docs = graft.core.Tables.documents(spark, sf1)
      val nShared = docs.filter(
        col("doc_id") % RemovedInV2Mod =!= RemovedInV2Rem &&
          col("doc_id") % DroppedFromV1Mod =!= DroppedFromV1Rem).count()
      val nCrawl = docs.filter(
        col("doc_id") % DroppedFromV1Mod =!= DroppedFromV1Rem).count()
      linkage.stats("n_crawl") = nCrawl
      linkage.stats("n_shared") = nShared
      val linked = graft.operators.Linkage.q220TieredLinkage(spark, sf1).cache()
      val nLinked = linked.count()
      val nExact = linked.filter(col("tier") === "exact").count()
      val nFuzzy = nLinked - nExact
      val nTrue = linked.filter(col("is_true")).count()
      linkage.stats("n_linked") = nLinked
      linkage.stats("n_exact") = nExact
      linkage.stats("n_fuzzy") = nFuzzy
      linkage.gate("one_link_per_doc")(
        linked.select("new_id").distinct().count() == nLinked)
      // every shared doc has an identical registry twin → must link
      linkage.gate("links_cover_shared")(nLinked >= nShared)
      // the exact tier absorbs the unchanged mass; fuzzy rides churn
      // (shared-changed ≈ 1/17 of shared, plus births)
      linkage.gate("exact_tier_dominant")(nExact * 10 >= nLinked * 9)
      linkage.gate("fuzzy_rides_churn")(nFuzzy * 10 <= nCrawl)
      // content-only precision against the held-out id ground truth
      linkage.gate("precision_floor_0.9")(nTrue * 10 >= nLinked * 9)
      linked.unpersist()
    }

    // ---- block 4: the composed curation pipeline (q228) at 10× ----
    // the end-to-end chain a real run executes; the gates are the
    // manifest's own invariants — chain consistency, drop accounting,
    // non-trivial dedup, mix mass conservation, pack coverage — which
    // is what "the pipeline still works at 10×" means operationally.
    val curation = new Block("curation_pipeline")
    locally {
      val rows = graft.operators.Curation.q228CurationManifest(spark, sf1).collect()
      def st(n: String) = rows.find(_.getString(1) == n).get
      curation.stats("n_docs_in") = st("ingest").getLong(3)
      curation.stats("n_kept_docs") = st("mix_reweight").getLong(3)
      curation.stats("n_weighted_out") = st("mix_reweight").getLong(4)
      curation.stats("n_sequences") = st("pack").getLong(4)
      curation.stats("n_dropped_total") = rows.take(5).map(_.getLong(7)).sum
      curation.gate("chain_consistent")((1 until 6).forall(i =>
        rows(i).getLong(3) == rows(i - 1).getLong(4) &&
          rows(i).getLong(5) == rows(i - 1).getLong(6)))
      curation.gate("drop_accounting")(rows.take(5).forall(r =>
        r.getLong(7) == r.getLong(3) - r.getLong(4) &&
          r.getLong(4) <= r.getLong(3) && r.getLong(6) <= r.getLong(5)))
      curation.gate("nonempty_output")(
        st("mix_reweight").getLong(4) > 0 && st("pack").getLong(4) > 0)
      curation.gate("dedup_dropped_something")(
        st("exact_dedup").getLong(7) + st("near_dedup").getLong(7) > 0)
      curation.gate("mix_conserves_mass")(
        math.abs(st("mix_reweight").getLong(4) - st("mix_reweight").getLong(3))
          <= st("mix_reweight").getLong(3) / 10)
      curation.gate("pack_covers_tokens")(
        st("pack").getLong(6) >= st("pack").getLong(5))
    }

    // ---- block 5: incremental admission (q234/q235) at 10× ----
    // the continuous-ingest front door against the 10× store: the
    // gates re-screen the ADMITTED set in-plan (nothing admitted is a
    // store duplicate / eval doc / sub-floor document) and prove the
    // at-ingest stream twin drains row-identical at this scale.
    val admission = new Block("incremental_ingest")
    locally {
      import graft.operators.{Admission, Curation, Dedup}
      val docs = graft.core.Tables.documents(spark, sf1)
      val batch = Admission.q234IncrementalAdmission(spark, sf1).localCheckpoint()
      val nArr = docs.filter(Admission.isArriving).count()
      val byV = batch.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      admission.stats("n_arriving") = nArr
      admission.stats("n_admitted") = byV.getOrElse("admitted", 0L)
      admission.stats("n_near_dup") = byV.getOrElse("near_duplicate", 0L)
      admission.stats("n_batch_near_dup") = byV.getOrElse("batch_near_duplicate", 0L)
      admission.stats("n_contaminated") = byV.getOrElse("contaminated", 0L)
      admission.gate("totality")(batch.count() == nArr)
      admission.gate("closed_verdict_set")(byV.keySet.subsetOf(Set(
        "empty_text", "low_quality", "exact_duplicate", "batch_duplicate",
        "near_duplicate", "batch_near_duplicate", "eval_reserved",
        "contaminated", "admitted")))
      val base = Admission.screenCols(docs)
      val admitted = batch.filter(col("verdict") === "admitted").select("doc_id")
      val aBase = base.join(admitted, Seq("doc_id"))
      admission.gate("admitted_above_floor")(aBase.filter(
        col("q_micro") < Curation.QualityFloorMicro || col("n_tok") === 0)
        .count() == 0)
      admission.gate("admitted_non_eval")(admitted.filter(
        col("doc_id") % Dedup.EvalDocModulus === 0).count() == 0)
      admission.gate("admitted_not_in_store")(aBase.join(
        base.filter(!Admission.isArriving).select("fp").distinct(),
        Seq("fp"), "left_semi").count() == 0)
      // near-dup-free by construction: no verified pair (store-cross OR
      // batch-internal) survives with both endpoints admitted
      val vp = graft.operators.Dedup.q27MinhashLsh(spark, sf1)
      admission.gate("admitted_near_dup_free")(vp
        .join(admitted.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
        .join(admitted.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
        .count() == 0)
      val stream = graft.streaming.AdmissionStream.q235StreamAdmission(spark, sf1)
      admission.gate("stream_matches_batch")(
        stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
    }

    // ---- block 6: compaction after a streaming drain at 10× ----
    // streaming drains + partitioned appends are what fragment a 100 TB
    // store: run a REAL watermarked drain in 8 micro-batches (8
    // time-sliced source files, one per trigger), survey() the drained
    // leaf, compact it, and assert row-identity, the target file count,
    // and that a subsequent query's scan reads exactly the compacted
    // files — the full small-files lifecycle, not the Compactor spec's
    // standalone fixture.
    val compaction = new Block("compaction_lifecycle")
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft-compaction").toString
      val srcDir = new java.io.File(base, "src")
      require(srcDir.mkdirs())
      // normalize ts to TIMESTAMP (the fixture tree may carry NTZ, which
      // watermarks reject) — the Tables.events convention, applied to
      // the slice copy so the streamed schema is watermarkable
      val ev = spark.read.parquet(s"$sf1/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
      val sliced = ev
        .withColumn("slice", ntile(8).over(Window.orderBy("ts", "event_id")))
        .cache()
      (1 to 8).foreach { i =>
        val tmp = s"$base/slice$i"
        sliced.filter(col("slice") === i).drop("slice")
          .coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file for slice $i"))
        val dst = new java.io.File(srcDir, f"slice-$i%02d.parquet")
        require(part.renameTo(dst))
        require(dst.setLastModified(1700000000000L + i * 60000L))
      }
      sliced.unpersist()
      val drainDir = s"$base/drain"
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir.getPath)
          .withWatermark("ts", "1 minute")
          .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n"), col("total_value"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", drainDir)
          .option("checkpointLocation", s"$base/checkpoint")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)

      def dataFiles(d: String): Array[java.io.File] =
        Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
            !f.getName.startsWith("_") && !f.getName.startsWith("."))
      val filesBefore = dataFiles(drainDir).length
      compaction.stats("n_files_drained") = filesBefore.toLong
      compaction.gate("drain_fragmented")(filesBefore > 1)
      val leaf = graft.layout.Compactor.survey(spark, drainDir).collect()
        .find(_.getString(0) == drainDir)
      compaction.gate("survey_flags_leaf")(leaf.exists(_.getBoolean(3)))
      // decimal(38,0) accumulator: a bigint sum of full-range xxhash64
      // values overflows Long, which ANSI mode turns into a job error
      val hashCols = xxhash64(
        Seq("window_start", "event_type", "n", "total_value").map(col): _*)
        .cast("decimal(38,0)")
      val before = spark.read.parquet(drainDir)
      val nBefore = before.count()
      val hashBefore = before.agg(sum(hashCols)).collect()(0).getDecimal(0)
      compaction.stats("n_rows_drained") = nBefore
      val report = graft.layout.Compactor.compact(spark, drainDir)
      compaction.stats("n_files_after") = report.filesAfter.toLong
      compaction.gate("compacted")(report.compacted)
      val want = math.max(1, math.ceil(report.bytesBefore.toDouble /
        graft.layout.Compactor.DefaultTargetBytes).toInt)
      compaction.gate("file_count_at_target")(report.filesAfter == want)
      val after = spark.read.parquet(drainDir)
      compaction.gate("rows_identical")(after.count() == nBefore &&
        after.agg(sum(hashCols)).collect()(0).getDecimal(0) == hashBefore)
      // a subsequent query's scan must read exactly the compacted files
      val post = spark.read.parquet(drainDir).filter(col("n") >= 0)
      post.collect()
      val scannedFiles = post.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics.get("numFiles").map(_.value)
        }.flatten
      scannedFiles.foreach(n => compaction.stats("n_files_scanned") = n)
      compaction.gate("scan_reads_compacted")(
        scannedFiles.contains(report.filesAfter.toLong))
    }

    // ---- block 7: the export landing (q248) at 10× ----
    // the writer lands the 10× training set as partitioned shards and
    // the verifier re-reads the landed bytes: every shard must
    // reconcile (records, tokens, weighted mass, shard draw, content
    // checksum) against the manifest recomputed from the corpus — the
    // artifact a training job consumes, proven at scale, not just at
    // the fixture SF.
    val export = new Block("export_landing")
    locally {
      val prev = spark.conf.getOption("spark.graft.export.dir")
      val root = java.nio.file.Files.createTempDirectory("graft-export-sf1").toString
      spark.conf.set("spark.graft.export.dir", root)
      try {
        val t0 = System.nanoTime()
        val rows = graft.operators.Export.q248ExportVerify(spark, sf1).collect()
        export.stats("n_shards") = rows.length.toLong
        export.stats("n_records_landed") = rows.map(_.getLong(1)).sum
        export.stats("n_tokens_landed") = rows.map(_.getLong(2)).sum
        export.stats("land_and_verify_ms") = (System.nanoTime() - t0) / 1000000
        export.gate("nonempty")(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
        // this single gate IS the record-mass check: the reconcile is a
        // FULL OUTER join vs the from-corpus manifest, so a shard the
        // landing is missing (or carrying extra/short) surfaces as a
        // records_match=false row — re-deriving the manifest total here
        // would pay a second full-ledger pass at 10× for a fact the
        // join already proved
        export.gate("all_shards_reconcile")(rows.forall(r =>
          r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) &&
            r.getBoolean(8) && r.getBoolean(9)))
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.graft.export.dir", v)
          case None => spark.conf.unset("spark.graft.export.dir")
        }
        // reap the landed 10× corpus copy — repeated validation runs
        // would otherwise accumulate full-corpus trees in the temp dir
        def rmrf(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
          f.delete()
        }
        rmrf(new java.io.File(root))
      }
    }

    // ---- block 8: the probe-broadcast cosine kernel at 10× ----
    // round-15 verdict item 4, decided with data: the q29-family kernel
    // (probes broadcast, corpus streamed) runs on the SCAN's partitions,
    // and a one-row-group fixture puts the whole kernel on one task.
    // Tables.fanoutIfHeavy gates a round-robin fanout on the estimated
    // input size (default ≥2 MB): at sf0.1 (0.8 MB) it must stay a no-op
    // (the exchange measured SLOWER than the tens-of-ms kernel), at this
    // tree (≥5 MB) it must engage and the kernel must parallelize.
    val probeKernel = new Block("probe_kernel")
    locally {
      val emb = graft.core.Tables.embeddings(spark, sf1)
      val scanParts = emb.rdd.getNumPartitions
      val gated = graft.core.Tables.fanoutIfHeavy(spark, emb)
      probeKernel.stats("scan_partitions") = scanParts.toLong
      probeKernel.stats("kernel_partitions") = gated.rdd.getNumPartitions.toLong
      probeKernel.gate("fanout_engages_at_10x")(
        gated.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
      def time3(body: => Unit): Long = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000000
        }
        ts.min
      }
      val tOn = time3 {
        graft.operators.Similarity.q29CosineTopK(spark, sf1)
          .write.format("noop").mode("overwrite").save()
      }
      spark.conf.set("spark.graft.scanFanout", "0")
      val tOff = try time3 {
        graft.operators.Similarity.q29CosineTopK(spark, sf1)
          .write.format("noop").mode("overwrite").save()
      } finally spark.conf.unset("spark.graft.scanFanout")
      probeKernel.stats("q29_ms_fanout_on") = tOn
      probeKernel.stats("q29_ms_fanout_off") = tOff
      // tolerant bound — this is a recorded comparison, not a race
      probeKernel.gate("fanout_not_slower")(tOn <= tOff * 3 / 2)
    }

    val blocks = Seq(dedup, serving, linkage, curation, admission, compaction,
      export, probeKernel)
    val ok = blocks.forall(_.checks.values.forall(identity))
    val line =
      s"""{"metric":"scale_validate","ok":$ok,"sf1_dir":"$sf1",""" +
        s""""stats":{${stats.map { case (k, v) => s"\"$k\":$v" }.mkString(",")}},""" +
        s""""gates":{${dedup.checks.map { case (k, v) => s"\"$k\":$v" }.mkString(",")}},""" +
        s""""blocks":{${blocks.map(_.json).mkString(",")}}}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE_VALIDATE.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
