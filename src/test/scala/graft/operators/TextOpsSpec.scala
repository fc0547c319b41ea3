package graft.operators

import org.apache.spark.sql.functions.{array_distinct, col, explode, size, sum}
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  test("tokens drops empties from repeated/trailing separators") {
    import spark.implicits._
    val df = Seq("a  b ", " a", "").toDF("text")
    val got = df.select(TextOps.tokens(col("text"))).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a", "b"))
    assert(got(1) == Seq("a"))
    assert(got(2) == Seq())
  }

  test("languageId picks the language with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("el gato la casa que es", "es"),
      ("le chat et la maison est", "fr"),
      ("der hund und die katze ist", "de")).toDF("text", "expected")
    val got = df.select(TextOps.languageId(col("text")), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("fingerprint is stable and whitespace-trim normalized") {
    import spark.implicits._
    val df = Seq(("a b c", " a b c  ")).toDF("t1", "t2")
    val r = df.select(TextOps.fingerprint(col("t1")), TextOps.fingerprint(col("t2"))).head()
    assert(r.getString(0) == r.getString(1))
  }

  test("approx distinct gate: exact counts agree with q16 and verdicts hold") {
    val gate = Relational.q42ApproxDistinct(spark, sf).head()
    val exact = Relational.q16Distinct(spark, sf).head()
    // columns: n_parts, parts_within_2sigma, n_suppliers, suppliers_…, n_orders, orders_…
    assert(gate.getLong(0) == exact.getLong(0), "exact part count")
    assert(gate.getLong(2) == exact.getLong(1), "exact supplier count")
    Seq(1, 3, 5).foreach(i => assert(gate.getBoolean(i), s"HLL 2σ verdict col $i"))
  }

  test("q159 bigram LM: engine scores equal a full driver-side replay; order carries signal") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val toks = docs.map { case (d, t) => d -> t.split(" ").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty).toMap
    // driver replay: bigram counts with BOS, add-1 over (htot + V)
    val bigrams = toks.toSeq.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) =>
        (d, if (i == 0) TextOps.BosToken else ts(i - 1), w)
      }
    }
    val cnt = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val htot = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val v = toks.values.flatten.toSet.size.toLong
    val micro = cnt.map { case ((h, w), c) =>
      (h, w) -> math.round(-(math.log((c + 1).toDouble / (htot(h) + v)) / math.log(2)) * 1e6)
    }
    val expect = toks.map { case (d, ts) =>
      val s = ts.zipWithIndex.map { case (w, i) =>
        micro((if (i == 0) TextOps.BosToken else ts(i - 1), w))
      }.sum
      val n = ts.length.toLong
      d -> ((n, math.floor((s * 2 + n * 100).toDouble / (n * 200)) / 10000.0))
    }
    val got = TextOps.q159BigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expect.keySet, "every tokenized doc scores")
    got.foreach { case (d, v2) => assert(v2 == expect(d), s"doc $d bigram bits") }
    // the order-2 model sees sequence structure the unigram model can't:
    // scores must not collapse to the q78 values
    val uni = TextOps.q78UnigramLogprob(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val differing = got.count { case (d, (_, b)) => math.abs(b - uni(d)) > 1e-9 }
    assert(differing * 10 > got.size * 9, "bigram scores should differ from unigram almost everywhere")
  }

  test("unigram LM scoring: rare-token docs score more bits than common-token docs") {
    val rows = TextOps.q78UnigramLogprob(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.trim(
          org.apache.spark.sql.functions.col("text"))) > 0).count()
    assert(rows.length == total, "every non-empty doc gets a score")
    rows.foreach { case (id, n, bits) =>
      assert(n > 0 && bits > 0, s"doc $id: n=$n bits=$bits")
    }
    // exact-value check on a tiny hand-computed corpus: 9 docs of
    // "common common" + 1 of "rare rare" → p(common)=18/20, p(rare)=2/20;
    // every token in a doc has the same surprisal, so the per-doc mean
    // IS that token's micro-bits value
    import spark.implicits._
    val tiny = ((1 to 9).map(i => (i.toLong, "common common")) :+ (10L, "rare rare"))
      .toDF("doc_id", "text")
    def microBits(p: Double): Double =
      math.floor((2 * math.round(-(math.log(p) / math.log(2)) * 1000000) * 2 + 2 * 100) /
        (2 * 200.0)) / 10000.0
    // run the same plan over the tiny corpus via a temp swap of the
    // documents source: easiest is to recompute with the public pieces
    val tok = tiny.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.explode(TextOps.tokens(
        org.apache.spark.sql.functions.col("text"))).as("token"))
    val got = {
      import org.apache.spark.sql.functions._
      val counts = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val scores = counts.withColumn("n_total", sum(col("cnt")).over(w))
        .select(col("token"),
          round(-log2(col("cnt").cast("double") / col("n_total")) * 1000000)
            .cast("long").as("micro_bits"))
      tok.join(scores, Seq("token")).groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum(col("micro_bits")).as("s"))
        .select(col("doc_id"),
          (floor((col("s") * 2 + col("n") * 100) / (col("n") * 200)) / 10000.0)
            .as("bits"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(math.abs(got(1L) - microBits(18.0 / 20)) < 1e-9, s"common doc: ${got(1L)}")
    assert(math.abs(got(10L) - microBits(2.0 / 20)) < 1e-9, s"rare doc: ${got(10L)}")
    assert(got(10L) > got(1L), "rare tokens must cost more bits")
  }

  test("q61 gate verdict: per-doc ratios stay produced, bounds and correlation hold") {
    val row = TextOps.q61CompressRatio(spark, sf).head()
    val detail = TextOps.compressionRatios(spark, sf).collect()
    assert(row.getLong(0) == detail.length.toLong)
    assert(row.getBoolean(1) && row.getBoolean(2), s"gate verdicts must hold: $row")
    // the production entry still carries the per-doc signal the gate vouches for
    assert(detail.forall(r => r.getDouble(1) > 0.0 && r.getDouble(1) <= TextOps.DeflateRatioMax))
  }

  test("quality tiers cover the corpus") {
    val rows = TextOps.q23QualityScore(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.core.Tables.documents(spark, sf).count())
  }

  test("rollingFingerprint folds UTF-8 bytes exactly (incl. non-ASCII, empty)") {
    import spark.implicits._
    def jvmRef(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    val inputs = Seq("hello world", "héllo wörld", "", "a", "日本語テキスト")
    val got = inputs.toDF("text")
      .select(TextOps.rollingFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(jvmRef))
  }

  test("native rolling_hash matches the composable hex-pair fold on the corpus") {
    val docs = graft.core.Tables.documents(spark, sf)
    val mismatches = docs.select(
        TextOps.rollingFingerprint(org.apache.spark.sql.functions.trim(col("text"))).as("native"),
        TextOps.rollingFingerprintComposable(org.apache.spark.sql.functions.trim(col("text"))).as("composable"))
      .filter(col("native") =!= col("composable"))
      .count()
    assert(mismatches == 0)
    // and the SQL surface sees it
    graft.functions.Dialect.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash('hello world')").head().getLong(0)
    val ref = "hello world".getBytes("UTF-8")
      .foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    assert(viaSql == ref)
  }

  test("deflate ratio separates repetitive from natural text and matches a JVM deflate") {
    import spark.implicits._
    val repetitive = "spam " * 500
    val natural = (1 to 500).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    val rows = Seq((1L, repetitive), (2L, natural)).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.VectorFunctions.deflate_ratio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) < 0.05, s"repetitive text should crush: ${rows(1L)}")
    assert(rows(2L) > 3 * rows(1L), s"natural text must compress far less: $rows")
    // exact parity with a direct JVM deflate of the same bytes
    val expect = graft.functions.DeflateUtil.ratio(repetitive.getBytes("UTF-8"))
    assert(rows(1L) == expect)
    // SQL surface
    graft.functions.Dialect.register(spark)
    assert(spark.sql("SELECT deflate_ratio('')").head().getDouble(0) == 1.0)
  }

  test("tf-idf emits exactly top-3 salient terms per document") {
    val rows = TextOps.q54TfIdf(spark, sf).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.nonEmpty)
    assert(perDoc.values.forall(_.length == 3))
    // rank order matches descending rounded score within each doc
    perDoc.values.foreach { rs =>
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("BPE-ish tokens never undercount whitespace tokens") {
    val rows = TextOps.q47TokenBpe(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      "subword pieces must be >= whole words")
  }

  test("chunking covers every token with the declared window and stride") {
    val chunks = TextOps.q65ChunkOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nTokens = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          TextOps.tokens(org.apache.spark.sql.functions.col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (c, s) = (TextOps.ChunkSize, TextOps.ChunkStride)
    nTokens.foreach { case (id, n) =>
      if (n == 0) assert(!chunks.contains(id), "empty docs emit no chunks")
      else {
        val expected = math.ceil(math.max(n - c, 0).toDouble / s).toInt + 1
        val got = chunks(id).sortBy(_._2)
        assert(got.length == expected, s"doc $id: ${got.length} chunks, expected $expected")
        // coverage: the last chunk reaches token n; all but the last are full
        val lastStart = (got.length - 1).toLong * s
        assert(lastStart + got.last._3 == n.toLong, s"doc $id: tail tokens dropped")
        got.dropRight(1).foreach { case (_, idx, len) =>
          assert(len == c.toLong, s"doc $id chunk $idx: non-final chunk not full")
        }
      }
    }
  }

  test("q92 PMI collocations: supported, ordered, and computed from one corpus scan") {
    val df = TextOps.q92PmiCollocations(spark, sf)
    val rows = df.collect()
    assert(rows.length == 30)
    // support floor and deterministic ordering
    assert(rows.forall(_.getLong(1) >= TextOps.PmiMinPair))
    val micros = rows.map(_.getLong(4)).toSeq
    assert(micros == micros.sorted.reverse, "must order by pmi desc")
    // PMI sanity on the winner: recompute from raw counts
    val top = rows.head
    val toks = graft.core.Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("t")).filter(size(col("t")) >= 2)
    val nU = toks.select(explode(col("t"))).count().toDouble
    val nB = toks.select((size(col("t")) - 1).cast("long").as("m"))
      .agg(sum("m")).head.getLong(0).toDouble
    val Array(w1, w2) = top.getString(0).split(" ")
    val c1 = toks.select(explode(col("t")).as("w")).filter(col("w") === w1).count()
    val c2 = toks.select(explode(col("t")).as("w")).filter(col("w") === w2).count()
    val expected = math.log((top.getLong(1) * nU * nU) / (nB * c1 * c2)) / math.log(2.0)
    assert(math.abs(top.getLong(4) / 1e6 - expected) < 1e-4)
    // scan budget: all three consumers (bigram rows, word lookups,
    // totals) read the cached vocab-sized ngram_counts stage — ZERO
    // parquet scans in the query's own plan, and the corpus-sized
    // window+aggregation ran once in the stage build, so the query plan
    // itself must contain NO Window node
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // count scan NODES in the executed plan — the formatted string also
    // prints each InMemoryTableScan's cached-relation DEFINITION, whose
    // "Scan parquet" lines are not executed reads
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def nodes(p: SparkPlan)(pf: PartialFunction[SparkPlan, Int]): Int = {
      val self = pf.applyOrElse(p, (_: SparkPlan) => 0)
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      self + kids.map(nodes(_)(pf)).sum
    }
    val executed = df.queryExecution.executedPlan
    assert(nodes(executed) { case _: FileSourceScanExec => 1 } == 0,
      s"q92 must read the ngram_counts stage, not re-scan the corpus\n$plan")
    assert(nodes(executed) { case _: WindowExec => 1 } == 0,
      s"q92's corpus-sized window+agg must run in the stage build, not per branch\n$plan")
    val finalSection = plan.split("== Initial Plan ==")(0)
    assert(finalSection.contains("InMemoryTableScan"),
      s"q92 must read the cached ngram_counts stage\n$plan")
  }

  test("q109 co-occurrence: Apriori-sound, supports verified by direct recount") {
    val rows = TextOps.q109Cooccurrence(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val docs = graft.core.Tables.documents(spark, sf)
      .select(array_distinct(TextOps.tokens(col("text"))).as("t"))
      .collect().map(_.getSeq[String](0).toSet)
    val floor = math.ceil(TextOps.CoocSupport * docs.length)
    rows.foreach { r =>
      val (w1, w2, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(w1 < w2, "pairs are canonically ordered")
      assert(n >= floor, s"($w1,$w2) below the support floor")
      // direct recount over the raw corpus
      val direct = docs.count(d => d.contains(w1) && d.contains(w2))
      assert(n == direct, s"($w1,$w2): $n vs direct $direct")
      assert(math.abs(r.getDouble(3) - n.toDouble / docs.length) < 1e-4)
    }
    // Apriori pruning is in the plan: the singles filter joins by broadcast
    val df = TextOps.q109Cooccurrence(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      s"frequent-singles prune must broadcast\n$plan")
  }

  test("BPE merge counts weight symbol pairs by occurrence frequency") {
    import spark.implicits._
    val occ = Seq("ab", "ab", "ab", "abc", "x").toDF("token")
    val out = TextOps.bpeMergeCounts(occ).collect()
    // (a,b): 3 from 'ab' + 1 from 'abc' = 4; (b,c): 1; 'x' has no pairs
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", "b", 4L), ("b", "c", 1L)))
  }

  test("iterated BPE recovers the known merge sequence with re-segmentation") {
    import spark.implicits._
    // corpus: 'aaab' x3, 'ab' x2. Round 1 counts over characters:
    // (a,a)=6, (a,b)=5 -> merge (a,a). Re-segmented: [aa,a,b] / [a,b].
    // Round 2: (aa,a)=3, (a,b)=3+2=5 -> merge (a,b); the greedy
    // left-to-right rule matters here ('aaa' folds to [aa,a], not
    // [a,aa]). Round 3: [aa,ab] -> merge (aa,ab)=3. The symbol-count
    // trajectory pins the re-segmentation itself: 13 -> 8 -> 5.
    val occ = (Seq.fill(3)("aaab") ++ Seq.fill(2)("ab")).toDF("token")
    val out = TextOps.bpeTrain(occ, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, "a", "a", 6L, 13L),
      (2L, "a", "b", 5L, 8L),
      (3L, "aa", "ab", 3L, 5L)))
  }

  test("BPE training saturates gracefully and the encode step applies the vocab") {
    import spark.implicits._
    // after 3 merges every token is ONE symbol — rounds 4 and 5 elect
    // nothing and must leave the vocabulary intact (merge table stops
    // at 3 rows, segmentation survives), not collapse it
    val occ = (Seq.fill(3)("aaab") ++ Seq.fill(2)("ab")).toDF("token")
    val (merges, seg) = TextOps.bpeTrainFull(occ, rounds = 5)
    assert(merges.count() == 3L, "saturated rounds must elect nothing")
    val lens = seg.select(col("token"),
      size(TextOps.bpeSyms(col("seg")))).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(lens == Map("aaab" -> 1, "ab" -> 1))
    // encode: fertility = BPE symbols per whitespace token, per source.
    // With 4 training rounds this corpus fully saturates -> 1 symbol
    // per word, fertility exactly 1.0 in micros
    val occ2 = Seq((1L, "aaab"), (1L, "aaab"), (1L, "aaab"),
      (2L, "ab"), (2L, "ab")).toDF("doc_id", "token")
    val meta = Seq((1L, "src_x"), (2L, "src_y")).toDF("doc_id", "source")
    val enc = TextOps.bpeEncode(occ2, meta).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(enc == Seq(
      ("src_x", 3L, 3L, 1000000L),
      ("src_y", 2L, 2L, 1000000L)))
  }

  test("trained BPE artifact persists per corpus version and reloads without retraining") {
    // round-14 verdict item 5: the merge table + vocabulary segmentation
    // are per-version artifacts like SignatureStage/IVF centroids — a
    // warm corpus must serve them from storage, never retrain in-query
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe").toFile
    val src = new java.io.File(sf, "documents.parquet")
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(tmp, "documents.parquet").toPath)
    spark.conf.set("spark.graft.signatures.persist", "true")
    try {
      val first = TextOps.q250BpeTrain(spark, tmp.getPath)
        .collect().map(_.toString).toSeq
      assert(first.size == TextOps.BpeTrainRounds.toLong)
      // wipe the in-memory cache; the throwing thunks prove both
      // artifacts come back from the persisted parquet, not a rebuild
      SignatureStage.release(spark, tmp.getPath)
      val merges = SignatureStage.stage(spark, tmp.getPath,
        s"bpe_merges_r${TextOps.BpeTrainRounds}") {
        throw new AssertionError("persisted merge table must reload, not retrain")
      }
      assert(merges.orderBy("merge_ord").collect().map(_.toString).toSeq == first,
        "reloaded merge table must be value-identical to the trained one")
      val seg = SignatureStage.stage(spark, tmp.getPath,
        s"bpe_seg_r${TextOps.BpeTrainRounds}") {
        throw new AssertionError("persisted segmentation must reload, not retrain")
      }
      assert(seg.columns.toSeq == Seq("token", "seg", "n_occ"))
      // the encode consumer (q252) rides the reloaded artifact end-to-end
      assert(TextOps.q252BpeEncode(spark, tmp.getPath).count() > 0)
    } finally {
      spark.conf.unset("spark.graft.signatures.persist")
      SignatureStage.release(spark, tmp.getPath)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("zipf slope recovers -1 on an exactly-Zipfian vocabulary") {
    import spark.implicits._
    // cf = 12/rank exactly (12, 6, 4, 3) → ln(cf) = ln 12 − ln(rank):
    // a perfect fit with slope −1 and intercept ln 12
    val occ = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d")).toDF("token")
    val r = TextOps.zipfSlope(occ, topK = 4).collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-4, s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log(12)) < 1e-4,
      s"intercept ${r.getDouble(2)}")
  }

  test("vocab coverage flags occurrences outside the top-V reference vocabulary") {
    import spark.implicits._
    val occ = Seq((0L, "x"), (0L, "x"), (0L, "y"), (1L, "x"), (1L, "z"))
      .toDF("doc_id", "token")
    val meta = Seq((0L, "s1", "en"), (1L, "s2", "en"))
      .toDF("doc_id", "source", "lang")
    val out = TextOps.vocabCoverage(occ, meta, topV = 1).collect()
    // vocab = {x} (cf 3); s1: 3 occ / 1 oov (y); s2: 2 occ / 1 oov (z)
    val got = out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(("s1", "en", 3L, 1L, 1.0 / 3), ("s2", "en", 2L, 1L, 0.5)))
  }

  test("q144: perplexity buckets partition the corpus with ordered, disjoint score ranges") {
    val out = TextOps.q144PerplexityBuckets(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty && out.length <= TextOps.PerplexityBuckets)
    assert(out.forall { case (b, _, _, _, _) => b >= 0 && b < TextOps.PerplexityBuckets })
    // partition: every scored doc (≥1 token) lands in exactly one bucket
    val scored = TextOps.q78UnigramLogprob(spark, sf).count()
    assert(out.map(_._2).sum == scored, "bucket doc counts must sum to the scored corpus")
    // within-bucket range sanity + strictly ordered, disjoint ranges
    out.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
    out.sliding(2).foreach {
      case Array((_, _, _, _, hi1), (_, _, _, lo2, _)) =>
        assert(hi1 <= lo2, s"bucket ranges overlap: $hi1 > $lo2")
      case _ => ()
    }
    // deterministic
    val again = TextOps.q144PerplexityBuckets(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == again.toSeq)
  }

  test("q138: fertility totals reconcile with q47 per-doc counts") {
    val out = TextOps.q138TokenFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.nonEmpty)
    // corpus-level reconciliation against the q47 per-document profile
    val perDoc = TextOps.q47TokenBpe(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sum == perDoc.map(_._1).sum, "word totals")
    assert(out.map(_._4).sum == perDoc.map(_._2).sum, "subword totals")
    assert(out.map(_._2).sum == perDoc.length.toLong, "doc totals")
    // ratios re-derive from the emitted integer sums
    out.foreach { case (_, _, w, sw, b, fert, bps) =>
      val ef = if (w == 0) 0.0 else BigDecimal(sw.toDouble / w)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(fert - ef) < 1e-9)
      val eb = if (sw == 0) 0.0 else BigDecimal(b.toDouble / sw)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(bps - eb) < 1e-9)
    }
  }

  test("q179: the confusion matrix reconciles with q45 and the corpus") {
    import org.apache.spark.sql.functions._
    val cells = TextOps.q179LangidConfusion(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getBoolean(3))))
    // cells partition the corpus
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(cells.map(_._2._1).sum == total)
    // the agree flag is the cell identity
    cells.foreach { case ((l, p), (_, agree)) => assert(agree == (l == p)) }
    // column marginals equal q45's per-prediction counts
    val marginals = cells.groupBy(_._1._2).map { case (p, xs) => p -> xs.map(_._2._1).sum }
    val q45 = TextOps.q45LangId(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(marginals == q45, "prediction marginals must match q45")
    // the declared-lang marginals match the corpus lang histogram
    val declared = cells.groupBy(_._1._1).map { case (l, xs) => l -> xs.map(_._2._1).sum }
    val corpus = graft.core.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(declared == corpus)
  }

  test("q201 counts per-document internal trigram repeats, not cross-doc reuse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    Seq(
      (1L, "a b c x a b c", "en", "s", 0L),  // 'a b c' twice IN one doc -> 1 repeat
      (2L, "a b c y z", "en", "s", 0L),      // same gram once -> no repeat
      (3L, "q q q q", "en", "s", 0L))        // 'q q q' twice in one doc
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = TextOps.q201TemplateSpans(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a b c" -> ((1L, 1L)), "q q q" -> ((1L, 1L))),
      "only internally-repeated grams appear; doc 2's single use is invisible")
  }
}
