package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL table functions over the LLM-pipeline operator family.
  *
  * The reference's one query API is SQL-in, CSV-out
  * (reference `test_pipeline.py:144-214` — `start_query_execution` with a
  * SQL string); graft mirrors it in
  * [[graft.exec.QueryExecutionManager]]. Until now the table-SHAPED
  * operators (BM25 retrieval, decontamination, semantic dedup, source
  * quotas, corpus diff) were reachable only as Scala calls — a user of
  * the SQL surface could not run them at all. This registrar puts them
  * behind Spark's native table-valued-function resolution, so
  *
  * {{{
  *   SELECT * FROM bm25('spark join', 5)
  *   SELECT * FROM source_cap(50) WHERE source = 'web'
  *   SELECT * FROM sem_dedup(0.45)
  *   SELECT * FROM decontaminate('eval_docs')
  *   SELECT * FROM corpus_diff('documents_v1', 'documents')
  *   SELECT * FROM near_dup_pairs(0.6)
  *   SELECT * FROM containment(0.8)
  *   SELECT * FROM token_fertility()
  *   SELECT * FROM sem_decontaminate()
  *   SELECT * FROM dedup_apply(0.6) WHERE NOT is_keeper
  *   SELECT * FROM temperature_mix(0.7)
  *   SELECT * FROM corpus_drift('documents_v1', 'documents')
  *   SELECT * FROM chunk(40, 30)
  *   SELECT * FROM pii_redact()
  *   SELECT * FROM scd2('documents_v1', 'documents')
  *   SELECT * FROM quantize_error()
  *   SELECT * FROM novelty('reference_docs')
  *   SELECT * FROM heavy_hitters()
  *   SELECT * FROM weighted_sample(200)
  *   SELECT * FROM cooccurrence(0.1)
  *   SELECT * FROM k_anonymity(5) WHERE at_risk
  *   SELECT * FROM winsorize(0.05)
  *   SELECT * FROM cohort_retention()
  *   SELECT * FROM funnel()
  *   SELECT * FROM hybrid_rrf('spark join', 1, 10)
  *   SELECT * FROM corpus_datasheet()
  *   SELECT * FROM nb_quality()
  *   SELECT * FROM ingest_anomaly() WHERE is_spike
  *   SELECT * FROM hard_negatives(0.15, 0.45, 5)
  *   SELECT * FROM embedding_diversity()
  *   SELECT * FROM quality_propagation(0.6)
  *   SELECT * FROM cms_sketch()
  *   SELECT * FROM edit_verify(0.6) WHERE tier = 'near_exact'
  *   SELECT * FROM sorted_neighborhood()
  *   SELECT * FROM sq_search()
  *   SELECT * FROM truncation_sweep()
  *   SELECT * FROM nb_calibration()
  *   SELECT * FROM dp_release()
  *   SELECT * FROM langid_confusion() WHERE NOT agree
  *   SELECT * FROM source_quality_shrunk()
  *   SELECT * FROM quantile_sketch()
  *   SELECT * FROM z_range(5, 15, 10000, 20000)
  *   SELECT * FROM cms_probe('the quick brown fox jumps')
  *   SELECT * FROM ivf_maintain() WHERE drift
  *   SELECT * FROM topic_tag() WHERE topic = 'none'
  *   SELECT * FROM cdc_apply() WHERE alive
  *   SELECT * FROM hll_rollup()
  *   SELECT * FROM curriculum_shards()
  *   SELECT * FROM margin_pairs()
  *   SELECT * FROM embedding_outliers() WHERE is_outlier
  *   SELECT * FROM domain_reweight()
  *   SELECT * FROM score_drift('documents_v1_edit', 'documents_v2')
  *   SELECT * FROM skew_report()
  *   SELECT * FROM retrieval_eval()
  *   SELECT * FROM record_link('documents_v1', 'documents')
  *   SELECT * FROM phrase_search('hash join')
  *   SELECT * FROM pref_pairs(0.6) WHERE informative
  *   SELECT * FROM dedup_weights(0.6)
  *   SELECT * FROM jl_distortion()
  *   SELECT * FROM score_percentiles() WHERE pct_micro > 900000
  *   SELECT * FROM score_ks('documents_v1', 'documents') WHERE drifted
  *   SELECT * FROM tiered_link('documents_v1', 'documents')
  *   SELECT * FROM shard_rebalance()
  *   SELECT * FROM lf_agreement() WHERE kappa_micro > 400000
  *   SELECT * FROM l_diversity(3) WHERE at_risk
  *   SELECT * FROM source_ablation() WHERE delta_e4 < 0
  *   SELECT * FROM bootstrap_ci() WHERE replicate >= 0
  *   SELECT * FROM incremental_admission() WHERE verdict <> 'admitted'
  *   SELECT * FROM budget_waterfill() WHERE saturated
  *   SELECT * FROM cluster_prune() WHERE kept
  *   SELECT * FROM transition_matrix() WHERE p_micro > 500000
  *   SELECT * FROM flow_mining()
  *   SELECT * FROM rare_transitions()
  *   SELECT * FROM cross_modal_audit()
  *   SELECT * FROM training_export()
  *   SELECT * FROM bpe_train(4)
  *   SELECT * FROM bpe_encode() WHERE fertility_micro > 3000000
  *   SELECT * FROM retrieval_quality() WHERE query_id = -1
  * }}}
  *
  * all work through `spark.sql(...)` — and therefore through the
  * manager's submit/status/results lifecycle, composing with ordinary
  * SQL around them (projection, WHERE, joins, LIMIT).
  *
  * Each builder resolves its input tables BY NAME from the session
  * catalog (`spark.table`), the same way the reference's SQL addresses
  * crawler-registered tables — so the corpus the function sees is
  * whatever `documents`/`embeddings` resolve to (temp view, catalog
  * table, [[graft.catalog.TableRegistry]] registration). The returned
  * plan is the operator's ordinary DataFrame plan: everything downstream
  * (pushdown into the function's output, AQE, codegen) behaves exactly
  * as the Scala call does, because it IS the same plan.
  *
  * Arguments must be literals (they parameterize plan construction at
  * analysis time). `sem_dedup` additionally trains its capped-sample
  * quantizer during resolution — a bounded (≤4096-row) job, the same
  * cost the Scala entry pays.
  */
object TableFunctions {

  /** Cluster count for the `sem_dedup` TVF quantizer — corpus-sized via
    * [[graft.operators.Similarity.semClustersFor]] (a resolution-time
    * count over the named table, metadata-cheap on parquet; the same
    * bounded index-build work as the quantizer fit itself). */
  private def semClusters(emb: org.apache.spark.sql.DataFrame): Int =
    graft.operators.Similarity.semClustersFor(emb.count())

  // derived from the builder list so the idempotence check can never
  // cover only a stale subset of the registered functions
  private lazy val names = builders.map(_._1)

  /** Idempotent per-session registration (the table-function analogue of
    * [[Dialect.register]]; [[graft.core.Sessions.prepare]] routes through
    * here). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    if (names.forall(n => reg.functionExists(FunctionIdentifier(n)))) return
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** The builders, exposed for [[GraftExtensions]] to inject
    * config-driven (`spark.sql.extensions`) with identical semantics. */
  private[graft] val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "bm25" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(q, k) =>
          val terms = string(q, "bm25(query, k)")
            .split("\\s+").filter(_.nonEmpty).distinct.toSeq
          require(terms.nonEmpty, "bm25: query must contain at least one term")
          plan(spark => graft.operators.Retrieval.bm25TopK(
            spark.table("documents"), terms.map(0L -> _), int(k, "bm25(query, k)")))
        case _ => throw new IllegalArgumentException(
          "bm25 expects (query string, k)")
      }
    },
    "corpus_datasheet" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Corpus.corpusDatasheet(spark.table("documents")))
        case _ => throw new IllegalArgumentException("corpus_datasheet expects no arguments")
      }
    },
    "inverted_index" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(k) =>
          plan(spark => graft.operators.Retrieval.invertedIndexAudit(
            graft.operators.TextOps.tokenized(spark.table("documents"))
              .filter(org.apache.spark.sql.functions.col("token").isNotNull),
            int(k, "inverted_index(k)")))
        case _ => throw new IllegalArgumentException("inverted_index expects (k)")
      }
    },
    "bpe_merges" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(k) =>
          plan(spark => graft.operators.TextOps.bpeMergeCounts(
            graft.operators.TextOps.tokenized(spark.table("documents"))
              .filter(org.apache.spark.sql.functions.col("token").isNotNull),
            int(k, "bpe_merges(k)")))
        case _ => throw new IllegalArgumentException("bpe_merges expects (k)")
      }
    },
    "vocab_coverage" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(v) =>
          plan { spark =>
            val docs = spark.table("documents")
            graft.operators.TextOps.vocabCoverage(
              graft.operators.TextOps.tokenized(docs)
                .filter(org.apache.spark.sql.functions.col("token").isNotNull),
              docs.select("doc_id", "source", "lang"),
              int(v, "vocab_coverage(v)"))
          }
        case _ => throw new IllegalArgumentException("vocab_coverage expects (v)")
      }
    },
    // NOTE (round-15 advisor): resolving this TVF EXECUTES jobs — the
    // operator body eagerly materializes its distinct (source, shingle)
    // frame (Materialize.once), so even EXPLAIN over source_overlap()
    // runs the shingle explode + distinct. Deliberate: the lazy form
    // measured worse (concurrent consumers recompute partitions), and
    // the materialized frame is distinct-shingle grain, far below the
    // corpus the explode scans.
    "source_overlap" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            val docs = spark.table("documents")
            graft.operators.Dedup.sourceOverlap(
              graft.operators.Dedup.sigsOf(docs), docs.select("doc_id", "source"))
          }
        case _ => throw new IllegalArgumentException("source_overlap expects no arguments")
      }
    },
    "dup_clusters" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            val pairs = graft.operators.Dedup.jaccardPairs(
              graft.operators.Dedup.sigsOf(spark.table("documents")),
              dbl(thr, "dup_clusters(threshold)")).select("d1", "d2")
            graft.operators.Dedup.clusterHistogram(
              graft.operators.Dedup.minLabelComponents(spark, pairs))
          }
        case _ => throw new IllegalArgumentException("dup_clusters expects (threshold)")
      }
    },
    "mix_manifest" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(b) =>
          plan { spark =>
            import org.apache.spark.sql.functions.{col, size}
            val docs = spark.table("documents")
            graft.operators.Sampling.mixManifest(
              docs.select(col("doc_id"), col("source"),
                size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("n_tok")),
              graft.operators.Sampling.MixAlpha,
              long(b, "mix_manifest(budget)"))
          }
        case _ => throw new IllegalArgumentException("mix_manifest expects (budget)")
      }
    },
    "split_leakage" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            val docs = spark.table("documents")
            graft.operators.Dedup.splitLeakage(
              graft.operators.Dedup.prefixJaccardPairs(
                graft.operators.Dedup.sigsOf(docs), 0.6),
              graft.operators.Sampling.splitAssign(docs))
          }
        case _ => throw new IllegalArgumentException("split_leakage expects no arguments")
      }
    },
    "token_budget" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(b) =>
          plan { spark =>
            import org.apache.spark.sql.functions.{col, size}
            val docs = spark.table("documents")
            graft.operators.Sampling.tokenBudgetFill(
              docs.select(col("doc_id"), col("source"),
                size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("n_tok")),
              long(b, "token_budget(budget)"))
          }
        case _ => throw new IllegalArgumentException("token_budget expects (budget)")
      }
    },
    "zipf_slope" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(k) =>
          plan(spark => graft.operators.TextOps.zipfSlope(
            graft.operators.TextOps.tokenized(spark.table("documents"))
              .filter(org.apache.spark.sql.functions.col("token").isNotNull),
            int(k, "zipf_slope(k)")))
        case _ => throw new IllegalArgumentException("zipf_slope expects (k)")
      }
    },
    "hybrid_rrf" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(q, probe, k) =>
          plan(spark => graft.operators.Retrieval.hybridRrf(
            spark.table("documents"), spark.table("embeddings"),
            string(q, "hybrid_rrf(query, probe_id, k)"),
            long(probe, "hybrid_rrf(query, probe_id, k)"),
            int(k, "hybrid_rrf(query, probe_id, k)")))
        case _ => throw new IllegalArgumentException(
          "hybrid_rrf expects (query string, probe_id, k)")
      }
    },
    "source_cap" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(cap) =>
          plan(spark => graft.operators.Sampling.sourceCap(
            spark.table("documents"), int(cap, "source_cap(cap)")))
        case _ => throw new IllegalArgumentException("source_cap expects (cap)")
      }
    },
    "sem_dedup" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            val emb = spark.table("embeddings")
            graft.operators.Similarity.semDedup(
              emb,
              graft.operators.IvfIndex.centroidsOf(emb, semClusters(emb)),
              dbl(thr, "sem_dedup(threshold)"))
          }
        case _ => throw new IllegalArgumentException("sem_dedup expects (threshold)")
      }
    },
    "decontaminate" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(evalTable) =>
          plan { spark =>
            val sigs = graft.operators.Dedup.sigsOf _
            graft.operators.Dedup.decontaminate(
              spark,
              sigs(spark.table("documents")),
              sigs(spark.table(string(evalTable, "decontaminate(eval_table)"))))
          }
        case _ => throw new IllegalArgumentException(
          "decontaminate expects (eval_table name)")
      }
    },
    "eval_leak" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(evalTable) =>
          plan { spark =>
            import org.apache.spark.sql.functions.{col, explode}
            val sigs = graft.operators.Dedup.sigsOf _
            graft.operators.Dedup.evalLeakOver(
              sigs(spark.table(string(evalTable, "eval_leak(eval_table)"))),
              sigs(spark.table("documents"))
                .select(col("doc_id"), explode(col("hs")).as("h")))
          }
        case _ => throw new IllegalArgumentException(
          "eval_leak expects (eval_table name)")
      }
    },
    "corpus_diff" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(v1, v2) =>
          plan(spark => graft.operators.Corpus.diff(
            spark.table(string(v1, "corpus_diff(v1, v2)")),
            spark.table(string(v2, "corpus_diff(v1, v2)"))))
        case _ => throw new IllegalArgumentException(
          "corpus_diff expects (v1 table name, v2 table name)")
      }
    },
    "near_dup_pairs" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan(spark => graft.operators.Dedup.jaccardPairs(
            graft.operators.Dedup.sigsOf(spark.table("documents")),
            dbl(thr, "near_dup_pairs(threshold)")))
        case _ => throw new IllegalArgumentException("near_dup_pairs expects (threshold)")
      }
    },
    "containment" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          val t = dbl(thr, "containment(threshold)")
          require(t >= 0.0 && t <= 1.0, "containment: threshold must be in [0, 1]")
          plan(spark => graft.operators.Dedup.containmentPairs(
            graft.operators.Dedup.sigsOf(spark.table("documents")),
            math.round(t * 1e6), graft.operators.Dedup.ContainMinShingles))
        case _ => throw new IllegalArgumentException("containment expects (threshold)")
      }
    },
    "token_fertility" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.TextOps.tokenFertility(spark.table("documents")))
        case _ => throw new IllegalArgumentException("token_fertility expects no arguments")
      }
    },
    "sem_decontaminate" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Similarity.semDecontaminate(
            spark.table("embeddings"), spark.table("documents")))
        case _ => throw new IllegalArgumentException("sem_decontaminate expects no arguments")
      }
    },
    "dedup_apply" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            import org.apache.spark.sql.functions.col
            val pairs = graft.operators.Dedup.jaccardPairs(
              graft.operators.Dedup.sigsOf(spark.table("documents")),
              dbl(thr, "dedup_apply(threshold)")).select("d1", "d2")
            graft.operators.Dedup.minLabelComponents(spark, pairs)
              .select(col("doc_id"), col("keeper"),
                (col("doc_id") === col("keeper")).as("is_keeper"))
              .orderBy("doc_id")
          }
        case _ => throw new IllegalArgumentException("dedup_apply expects (threshold)")
      }
    },
    "temperature_mix" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(alpha) =>
          plan(spark => graft.operators.Sampling.temperatureMix(
            spark.table("documents"), dbl(alpha, "temperature_mix(alpha)")))
        case _ => throw new IllegalArgumentException("temperature_mix expects (alpha)")
      }
    },
    "corpus_drift" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(v1, v2) =>
          plan { spark =>
            import org.apache.spark.sql.functions.{count, lit}
            def cells(table: String, out: String) =
              spark.table(table)
                .groupBy("source", "lang").agg(count(lit(1)).as(out))
            graft.operators.Corpus.drift(
              cells(string(v1, "corpus_drift(v1, v2)"), "n1")
                .join(cells(string(v2, "corpus_drift(v1, v2)"), "n2"),
                  Seq("source", "lang"), "full_outer")
                .na.fill(0L, Seq("n1", "n2")))
          }
        case _ => throw new IllegalArgumentException(
          "corpus_drift expects (v1 table name, v2 table name)")
      }
    },
    "chunk" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(size, stride) =>
          plan(spark => graft.operators.TextOps.chunkOverlap(
            spark.table("documents"),
            int(size, "chunk(size, stride)"), int(stride, "chunk(size, stride)")))
        case _ => throw new IllegalArgumentException("chunk expects (size, stride)")
      }
    },
    "pii_redact" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            import org.apache.spark.sql.functions.col
            graft.operators.Privacy.redact(spark.table("documents"), col("text"))
          }
        case _ => throw new IllegalArgumentException("pii_redact expects no arguments")
      }
    },
    "lm_score" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.TextOps.unigramLogprob(spark.table("documents")))
        case _ => throw new IllegalArgumentException("lm_score expects no arguments")
      }
    },
    "scd2" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(v1, v2) =>
          plan(spark => graft.operators.Corpus.scd2(
            spark.table(string(v1, "scd2(v1, v2)")),
            spark.table(string(v2, "scd2(v1, v2)"))))
        case _ => throw new IllegalArgumentException(
          "scd2 expects (v1 table name, v2 table name)")
      }
    },
    "quantize_error" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            import org.apache.spark.sql.functions.col
            graft.operators.Quantize.int8Error(
              spark.table("embeddings"), col("embedding"))
          }
        case _ => throw new IllegalArgumentException("quantize_error expects no arguments")
      }
    },
    "novelty" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(ref) =>
          plan { spark =>
            import graft.operators.{Corpus, Dedup, TextOps}
            Corpus.novelty(
              Dedup.shingles(spark.table("documents"), TextOps.BoilerK),
              Dedup.shingles(spark.table(string(ref, "novelty(reference_table)")),
                TextOps.BoilerK))
          }
        case _ => throw new IllegalArgumentException(
          "novelty expects (reference_table name)")
      }
    },
    // like sem_dedup's quantizer fit, the bounded sketch pass runs at
    // resolution time (state <= SketchK entries; the recount is the plan)
    "heavy_hitters" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            import org.apache.spark.sql.functions._
            import graft.operators.{Dedup, HeavyHitters, TextOps}
            val sh = Dedup.shingles(spark.table("documents"), TextOps.BoilerK)
            val (cands, total) = HeavyHitters.candidates(sh, "s")
            val floor = total / HeavyHitters.SketchK
            import spark.implicits._
            sh.join(broadcast(cands.toDF("s")), Seq("s"))
              .groupBy("s")
              .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
              .filter(col("n_docs") > floor)
              .select(col("s").as("shingle"), col("n_docs"), col("first_doc"),
                lit(floor).as("floor_docs"))
          }
        case _ => throw new IllegalArgumentException("heavy_hitters expects no arguments")
      }
    },
    "span_dedup" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Dedup.spanDedup(
            spark.table("documents"), graft.operators.Dedup.SpanWindow))
        case Seq(w) =>
          plan(spark => graft.operators.Dedup.spanDedup(
            spark.table("documents"), int(w, "span_dedup(window_tokens)")))
        case _ => throw new IllegalArgumentException("span_dedup expects () or (window_tokens)")
      }
    },
    "weighted_sample" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(k) =>
          plan(spark => graft.operators.Sampling.weightedSample(
            spark.table("documents"), int(k, "weighted_sample(k)")))
        case _ => throw new IllegalArgumentException("weighted_sample expects (k)")
      }
    },
    "cooccurrence" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(sup) =>
          plan(spark => graft.operators.TextOps.cooccurrence(
            spark.table("documents"), dbl(sup, "cooccurrence(support)")))
        case _ => throw new IllegalArgumentException("cooccurrence expects (support)")
      }
    },
    "k_anonymity" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(k) =>
          plan { spark =>
            import org.apache.spark.sql.functions.col
            graft.operators.Privacy.kAnonymity(
              spark.table("customer").join(spark.table("nation"),
                col("c_nationkey") === col("n_nationkey")),
              Seq("c_mktsegment", "n_name"), int(k, "k_anonymity(k)").toLong)
          }
        case _ => throw new IllegalArgumentException("k_anonymity expects (k)")
      }
    },
    "winsorize" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(p) =>
          plan(spark => graft.operators.Analytics.winsorizedStats(
            spark.table("orders"), dbl(p, "winsorize(p)")))
        case _ => throw new IllegalArgumentException("winsorize expects (p)")
      }
    },
    "cohort_retention" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Analytics.cohortRetention(spark.table("events")))
        case _ => throw new IllegalArgumentException("cohort_retention expects no arguments")
      }
    },
    "funnel" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Analytics.funnelOver(spark.table("events")))
        case _ => throw new IllegalArgumentException("funnel expects no arguments")
      }
    },
    "nb_quality" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Classify.nbQualityOver(spark.table("documents")))
        case _ => throw new IllegalArgumentException("nb_quality expects no arguments")
      }
    },
    "ingest_anomaly" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Analytics.ingestAnomaly(spark.table("events")))
        case _ => throw new IllegalArgumentException("ingest_anomaly expects no arguments")
      }
    },
    "hard_negatives" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(lo, hi, k) =>
          val l = dbl(lo, "hard_negatives(lo, hi, k)")
          val h = dbl(hi, "hard_negatives(lo, hi, k)")
          require(l < h, "hard_negatives: lo must be < hi")
          plan(spark => graft.operators.Similarity.hardNegatives(
            spark.table("embeddings"), l, h, int(k, "hard_negatives(lo, hi, k)")))
        case _ => throw new IllegalArgumentException(
          "hard_negatives expects (lo, hi, k)")
      }
    },
    "embedding_diversity" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            import org.apache.spark.sql.functions.col
            graft.operators.Similarity.embeddingDiversity(
              spark.table("embeddings"),
              spark.table("documents")
                .select(col("doc_id").as("vec_id"), col("source")))
          }
        case _ => throw new IllegalArgumentException(
          "embedding_diversity expects no arguments")
      }
    },
    "quality_propagation" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            val docs = spark.table("documents")
            graft.operators.Propagate.qualityPropagation(docs,
              graft.operators.Dedup.jaccardPairs(
                graft.operators.Dedup.sigsOf(docs),
                dbl(thr, "quality_propagation(threshold)")))
          }
        case _ => throw new IllegalArgumentException(
          "quality_propagation expects (jaccard threshold)")
      }
    },
    "cms_sketch" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Cms.cmsAudit(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "cms_sketch expects no arguments")
      }
    },
    "edit_verify" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            val docs = spark.table("documents")
            graft.operators.Dedup.editVerify(
              graft.operators.Dedup.jaccardPairs(
                graft.operators.Dedup.sigsOf(docs),
                dbl(thr, "edit_verify(threshold)")),
              docs)
          }
        case _ => throw new IllegalArgumentException(
          "edit_verify expects (jaccard threshold)")
      }
    },
    "sorted_neighborhood" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Dedup.snPairs(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "sorted_neighborhood expects no arguments")
      }
    },
    "sq_search" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Sq.sqGateOver(spark,
            graft.operators.KMeans.quantizedOf(spark.table("embeddings"))))
        case _ => throw new IllegalArgumentException(
          "sq_search expects no arguments")
      }
    },
    "truncation_sweep" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Matryoshka.sweepOver(spark,
            graft.operators.KMeans.quantizedOf(spark.table("embeddings"))))
        case _ => throw new IllegalArgumentException(
          "truncation_sweep expects no arguments")
      }
    },
    "nb_calibration" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Classify.nbCalibrationOver(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "nb_calibration expects no arguments")
      }
    },
    "dp_release" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Privacy.dpRelease(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "dp_release expects no arguments")
      }
    },
    "langid_confusion" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.TextOps.langidConfusion(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "langid_confusion expects no arguments")
      }
    },
    "source_quality_shrunk" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Classify.shrunkQualityOver(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "source_quality_shrunk expects no arguments")
      }
    },
    "quantile_sketch" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.QuantileSketch.gateOver(spark.table("events")))
        case _ => throw new IllegalArgumentException(
          "quantile_sketch expects no arguments")
      }
    },
    "z_range" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(uLo, uHi, cLo, cHi) =>
          plan(spark => graft.layout.ZOrderLayout.rangeAggOverEvents(
            spark.table("events"),
            long(uLo, "z_range(u_lo, u_hi, cents_lo, cents_hi)"),
            long(uHi, "z_range(u_lo, u_hi, cents_lo, cents_hi)"),
            long(cLo, "z_range(u_lo, u_hi, cents_lo, cents_hi)"),
            long(cHi, "z_range(u_lo, u_hi, cents_lo, cents_hi)")))
        case _ => throw new IllegalArgumentException(
          "z_range expects (user_lo, user_hi, cents_lo, cents_hi)")
      }
    },
    "cms_probe" -> { exprs: Seq[Expression] =>
      exprs match {
        case grams if grams.nonEmpty =>
          plan(spark => graft.operators.Cms.probe(
            spark.table("documents"),
            grams.map(g => string(g, "cms_probe(ngram, ...)"))))
        case _ => throw new IllegalArgumentException(
          "cms_probe expects at least one n-gram string")
      }
    },
    "ivf_maintain" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.IvfMaintain.maintainFromEmbeddings(
            spark.table("embeddings")))
        case _ => throw new IllegalArgumentException(
          "ivf_maintain expects no arguments")
      }
    },
    "topic_tag" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Taxonomy.tagged(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "topic_tag expects no arguments")
      }
    },
    "cdc_apply" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Cdc.applyOver(spark.table("events")))
        case _ => throw new IllegalArgumentException(
          "cdc_apply expects no arguments")
      }
    },
    "hll_rollup" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.HllRollup.rollupOver(spark.table("events")))
        case _ => throw new IllegalArgumentException(
          "hll_rollup expects no arguments")
      }
    },
    // resolution runs the global-rank sort eagerly (the ivf_maintain /
    // sem_dedup resolution-time-job convention)
    "curriculum_shards" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Curriculum.shardsOver(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "curriculum_shards expects no arguments")
      }
    },
    // NOTE (round-15 advisor): resolving this TVF EXECUTES the full n²
    // cosine kernel — minedPairs rides marginRankTail, whose scored
    // candidate frame is eagerly materialized (Materialize.once) because
    // it feeds three incompatibly-partitioned consumers; even EXPLAIN
    // runs the kernel and pins the candidate frame (3 int64s per
    // positive-cosine pair — O(n²) worst case) in executor storage.
    // Deliberate: the lazy checkpoint measured worse on both miners
    // (round-15 log §1); a deployment that must EXPLAIN cheaply points
    // the TVF at the IVF-blocked miner instead.
    "margin_pairs" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Margin.minedPairs(spark.table("embeddings")))
        case _ => throw new IllegalArgumentException(
          "margin_pairs expects no arguments")
      }
    },
    "embedding_outliers" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Outlier.scoresOver(
            spark.table("embeddings"),
            spark.table("documents").select(
              org.apache.spark.sql.functions.col("doc_id").as("vec_id"),
              org.apache.spark.sql.functions.col("source"))))
        case _ => throw new IllegalArgumentException(
          "embedding_outliers expects no arguments")
      }
    },
    "domain_reweight" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Mixture.reweightDocs(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "domain_reweight expects no arguments")
      }
    },
    "score_drift" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(v1, v2) =>
          plan(spark => graft.operators.Drift.psiOver(
            spark.table(string(v1, "score_drift(v1, v2)")),
            spark.table(string(v2, "score_drift(v1, v2)"))))
        case _ => throw new IllegalArgumentException(
          "score_drift expects (v1 table, v2 table)")
      }
    },
    "skew_report" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Skew.skewReport(
            spark.table("events"), "user_id"))
        case _ => throw new IllegalArgumentException(
          "skew_report expects no arguments")
      }
    },
    "retrieval_eval" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Retrieval.evalDocs(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "retrieval_eval expects no arguments")
      }
    },
    "template_spans" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.TextOps.templateSpansOver(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "template_spans expects no arguments")
      }
    },
    "purge_audit" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Purge.auditOver(
            spark, spark.table("documents"), spark.table("embeddings")))
        case _ => throw new IllegalArgumentException(
          "purge_audit expects no arguments")
      }
    },
    "weak_labels" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.WeakLabels.labeled(spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "weak_labels expects no arguments")
      }
    },
    "weak_label_matrix" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.WeakLabels.matrixOver(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "weak_label_matrix expects no arguments")
      }
    },
    "code_switch" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.LangSegments.segmentsOver(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "code_switch expects no arguments")
      }
    },
    "phrase_tags" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Taxonomy.phraseTagsOver(
            spark, spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "phrase_tags expects no arguments")
      }
    },
    "trajectories" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Trajectory.assembled(
            spark.table("events").select(
              org.apache.spark.sql.functions.col("user_id"),
              org.apache.spark.sql.functions.col("ts"),
              org.apache.spark.sql.functions.col("event_id"),
              org.apache.spark.sql.functions.col("event_type"))))
        case _ => throw new IllegalArgumentException(
          "trajectories expects no arguments")
      }
    },
    "record_link" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(reg, crawl) =>
          plan(spark => graft.operators.Linkage.linkTables(
            spark.table(string(reg, "record_link(registry, crawl)")),
            spark.table(string(crawl, "record_link(registry, crawl)"))))
        case _ => throw new IllegalArgumentException(
          "record_link expects (registry table, crawl table)")
      }
    },
    "phrase_search" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(p) =>
          plan { spark =>
            import spark.implicits._
            // normalize BEFORE joining: the bigram table is built with
            // single-space concat_ws, so a phrase with a double space or
            // stray edge whitespace would pass the two-word validation
            // yet silently return zero hits
            val norm = string(p, "phrase_search(phrase)").trim.split("\\s+")
            require(norm.length == 2,
              "phrase_search expects a two-word phrase")
            graft.operators.Retrieval.phraseHits(
              spark.table("documents"), Seq(norm.mkString(" ")).toDF("phrase"))
          }
        case _ => throw new IllegalArgumentException(
          "phrase_search expects (two-word phrase)")
      }
    },
    "pref_pairs" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            import org.apache.spark.sql.functions.col
            val docs = spark.table("documents")
            val pairs = graft.operators.Dedup.jaccardPairs(
              graft.operators.Dedup.sigsOf(docs),
              dbl(thr, "pref_pairs(threshold)")).select("d1", "d2")
            graft.operators.Dedup.prefPairsOver(
              graft.operators.Dedup.minLabelComponents(spark, pairs)
                .select(col("doc_id"), col("keeper").as("grp")),
              graft.operators.Dedup.qualityMicroOf(docs))
          }
        case _ => throw new IllegalArgumentException("pref_pairs expects (threshold)")
      }
    },
    "cluster_safe_split" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            val docs = spark.table("documents")
            graft.operators.Sampling.clusterSafeSplitOver(spark, docs,
              graft.operators.Dedup.jaccardPairs(
                graft.operators.Dedup.sigsOf(docs),
                dbl(thr, "cluster_safe_split(threshold)")).select("d1", "d2"))
          }
        case _ => throw new IllegalArgumentException(
          "cluster_safe_split expects (threshold)")
      }
    },
    "curation_manifest" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            graft.operators.Curation.manifestOver(
              graft.core.Materialize.once(
                graft.operators.Curation.tableLedger(spark, spark.table("documents"))
                  .drop("text")))
          }
        case _ => throw new IllegalArgumentException(
          "curation_manifest expects no arguments")
      }
    },
    "curation_ledger" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            graft.operators.Curation.ledgerOutcomes(
              graft.operators.Curation.tableLedger(spark, spark.table("documents")))
          }
        case _ => throw new IllegalArgumentException(
          "curation_ledger expects no arguments")
      }
    },
    "dedup_weights" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(thr) =>
          plan { spark =>
            val docs = spark.table("documents")
            val pairs = graft.operators.Dedup.jaccardPairs(
              graft.operators.Dedup.sigsOf(docs),
              dbl(thr, "dedup_weights(threshold)")).select("d1", "d2")
            graft.operators.Dedup.softWeightsOver(
              graft.operators.Dedup.minLabelComponents(spark, pairs), docs)
          }
        case _ => throw new IllegalArgumentException("dedup_weights expects (threshold)")
      }
    },
    "jl_distortion" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.RandomProjection.distortionOver(
            spark.table("embeddings")))
        case _ => throw new IllegalArgumentException(
          "jl_distortion expects no arguments")
      }
    },
    "score_percentiles" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.ScoreNorm.percentilesOver(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "score_percentiles expects no arguments")
      }
    },
    "score_ks" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(v1, v2) =>
          plan(spark => graft.operators.ScoreNorm.ksOver(
            spark.table(string(v1, "score_ks(v1, v2)")),
            spark.table(string(v2, "score_ks(v1, v2)"))))
        case _ => throw new IllegalArgumentException(
          "score_ks expects (v1 table, v2 table)")
      }
    },
    "tiered_link" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(reg, crawl) =>
          plan { spark =>
            import org.apache.spark.sql.functions.col
            graft.operators.Linkage.tieredLink(
              spark.table(string(reg, "tiered_link(registry, crawl)"))
                .select(col("doc_id").as("old_id"), col("text")),
              spark.table(string(crawl, "tiered_link(registry, crawl)"))
                .select(col("doc_id").as("new_id"), col("text")))
          }
        case _ => throw new IllegalArgumentException(
          "tiered_link expects (registry table, crawl table)")
      }
    },
    "shard_rebalance" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Sharding.rebalanceOver(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "shard_rebalance expects no arguments")
      }
    },
    "lf_agreement" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.WeakLabels.agreementOver(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "lf_agreement expects no arguments")
      }
    },
    "l_diversity" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq(l) =>
          plan { spark =>
            import org.apache.spark.sql.functions.{col, expr}
            graft.operators.Privacy.lDiversity(
              spark.table("customer").join(spark.table("nation"),
                col("c_nationkey") === col("n_nationkey")),
              Seq("c_mktsegment", "n_name"),
              expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000"),
              long(l, "l_diversity(l)"))
          }
        case _ => throw new IllegalArgumentException("l_diversity expects (l)")
      }
    },
    "bootstrap_ci" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Sampling.bootstrapCi(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "bootstrap_ci expects no arguments")
      }
    },
    "incremental_admission" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Admission.tableVerdicts(
            spark, spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "incremental_admission expects no arguments")
      }
    },
    "cross_modal_audit" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Audit.tableCrossModal(
            spark, spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "cross_modal_audit expects no arguments")
      }
    },
    "training_export" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Curation.tableExport(
            spark, spark.table("documents"), spark.table("embeddings")))
        case _ => throw new IllegalArgumentException(
          "training_export expects no arguments")
      }
    },
    "bpe_train" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.TextOps.tableBpeTrain(
            spark.table("documents"), graft.operators.TextOps.BpeTrainRounds))
        case Seq(k) =>
          // validated BEFORE the Int narrowing: a 2^32-scale literal
          // would otherwise truncate to 0/negative and crash obscurely
          val r = long(k, "bpe_train(rounds)")
          if (r < 1 || r > 1000) throw new IllegalArgumentException(
            s"bpe_train: rounds must be in [1, 1000], got $r")
          plan(spark => graft.operators.TextOps.tableBpeTrain(
            spark.table("documents"), r.toInt))
        case _ => throw new IllegalArgumentException(
          "bpe_train expects () or (rounds)")
      }
    },
    "bpe_encode" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.TextOps.tableBpeEncode(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "bpe_encode expects no arguments")
      }
    },
    "retrieval_quality" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Retrieval.tableQuality(
            spark.table("documents"), spark.table("embeddings")))
        case _ => throw new IllegalArgumentException(
          "retrieval_quality expects no arguments")
      }
    },
    "budget_waterfill" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Sampling.waterfillOver(
            spark.table("documents")))
        case _ => throw new IllegalArgumentException(
          "budget_waterfill expects no arguments")
      }
    },
    "cluster_prune" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            val q = graft.operators.KMeans.quantizedOf(spark.table("embeddings"))
            graft.operators.KMeans.pruneOver(q, graft.operators.KMeans.trainOn(q))
          }
        case _ => throw new IllegalArgumentException(
          "cluster_prune expects no arguments")
      }
    },
    "transition_matrix" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Trajectory.transitionsOver(
            spark.table("events")
              .select("user_id", "ts", "event_id", "event_type")))
        case _ => throw new IllegalArgumentException(
          "transition_matrix expects no arguments")
      }
    },
    "flow_mining" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Trajectory.flowsOver(
            spark.table("events")
              .select("user_id", "ts", "event_id", "event_type")))
        case _ => throw new IllegalArgumentException(
          "flow_mining expects no arguments")
      }
    },
    "rare_transitions" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan(spark => graft.operators.Trajectory.rareOver(
            spark.table("events")
              .select("user_id", "ts", "event_id", "event_type")))
        case _ => throw new IllegalArgumentException(
          "rare_transitions expects no arguments")
      }
    },
    "source_ablation" -> { exprs: Seq[Expression] =>
      exprs match {
        case Seq() =>
          plan { spark =>
            import org.apache.spark.sql.functions._
            val docs = spark.table("documents")
            val toks = graft.operators.TextOps.tokens(col("text"))
            graft.operators.Mixture.ablationOver(graft.operators.Mixture.sourceLoss(
              docs.select(col("doc_id"), explode(toks).as("token"))
                .groupBy("doc_id", "token").agg(count(lit(1)).as("tf")),
              docs.agg(sum(size(toks)).cast("long").as("n_total")),
              docs.select("doc_id", "source")))
          }
        case _ => throw new IllegalArgumentException(
          "source_ablation expects no arguments")
      }
    })

  /** Build the operator frame against the session resolving the query
    * and hand its analyzed plan to the outer analyzer (idempotent on
    * resolved subtrees). */
  private def plan(f: SparkSession => DataFrame): LogicalPlan =
    f(SparkSession.active).queryExecution.analyzed

  private def value(e: Expression, sig: String): Any = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$sig: arguments must be literals")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(s"$sig: argument is NULL")
    v
  }

  private def string(e: Expression, sig: String): String = value(e, sig).toString

  private def int(e: Expression, sig: String): Int = value(e, sig) match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$sig: expected an integer, got $other")
  }

  private def long(e: Expression, sig: String): Long = value(e, sig) match {
    case n: java.lang.Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"$sig: expected an integer, got $other")
  }

  private def dbl(e: Expression, sig: String): Double = value(e, sig) match {
    case n: java.lang.Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$sig: expected a number, got $other")
  }
}
