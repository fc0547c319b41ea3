package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks the term-dense short doc above a diluted long doc") {
    val docs = Seq(
      (1L, "spark spark spark"),                        // dense in 'spark'
      (2L, "spark alpha beta gamma delta epsilon zeta eta theta iota"), // diluted
      (3L, "alpha beta gamma"),                         // no match
      (4L, "spark spark alpha")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq(1L -> "spark"), k = 10).collect()
    // only matching docs appear, ranked dense-first
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 4L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.getDouble(3) > 0))
  }

  test("multi-term queries sum per-term contributions; rank ties break by doc_id") {
    val docs = Seq(
      (1L, "red blue"),
      (2L, "red blue"),   // identical content → identical score, tie → doc_id
      (3L, "red red"),
      (4L, "green")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq(7L -> "red", 7L -> "blue"), k = 10).collect()
    assert(out.map(_.getLong(2)).contains(3L))
    val d1 = out.find(_.getLong(2) == 1L).get
    val d2 = out.find(_.getLong(2) == 2L).get
    assert(d1.getDouble(3) == d2.getDouble(3), "identical docs score identically")
    assert(d1.getLong(1) < d2.getLong(1), "tie broken by doc_id")
    // two-term doc beats the single-repeated-term doc (idf of both terms)
    assert(out.head.getLong(2) == 1L)
  }

  test("q70 returns TopK rows per fixture query, deterministically") {
    val out = Retrieval.q70Bm25(spark, sf)
    val rows = out.collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(1L, 2L, 3L))
    byQuery.values.foreach { rs =>
      assert(rs.length == Retrieval.TopK)
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to Retrieval.TopK).toSeq)
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse, "scores descend with rank")
    }
    assert(out.collect().toSeq == rows.toSeq, "rerun is bit-identical")
  }

  test("q113 fuses sparse and dense ranks with exact RRF micros") {
    val rows = Retrieval.q113HybridRrf(spark, sf).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(1L, 2L, 3L))
    byQuery.values.foreach { rs =>
      assert(rs.length == Retrieval.RrfTopK)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to Retrieval.RrfTopK.toLong).toSeq)
      rs.foreach { r =>
        // rrf_micro is exactly the sum of the two integer contributions
        val bm = if (r.isNullAt(4)) 0L else 1000000L / (Retrieval.RrfK + r.getLong(4))
        val co = if (r.isNullAt(5)) 0L else 1000000L / (Retrieval.RrfK + r.getLong(5))
        assert(r.getLong(3) == bm + co, s"query ${r.getLong(0)} doc ${r.getLong(2)} micros")
        assert(!r.isNullAt(4) || !r.isNullAt(5), "a fused doc is ranked in at least one list")
      }
      val micros = rs.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
      assert(micros == micros.sorted.reverse, "fused micros descend with rank")
    }
    assert(Retrieval.q113HybridRrf(spark, sf).collect().toSeq == rows.toSeq,
      "rerun is bit-identical")
  }

  test("inverted-index audit: df, cf, first posting and fingerprint on a crafted corpus") {
    val docs = Seq((0L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val out = Retrieval.invertedIndexAudit(
      TextOps.tokenized(docs).filter(col("token").isNotNull)).collect()
    // a: (doc0,pos0)+(doc0,pos2)+(doc2,pos1) → df 2, cf 3,
    //    fp = 1·1 + 1·3 + 3·2 = 10
    // b: (doc0,pos1)+(doc2,pos0) → df 2, cf 2, fp = 1·2 + 3·1 = 5
    val got = out.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("a", 2L, 3L, 0L, 10L), ("b", 2L, 2L, 0L, 5L)))
  }

  test("q199 metrics equal a driver replay of the AND-containment relevance rule") {
    val ranked = Retrieval.q70Bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docTokens = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSet).toMap
    val byQuery = Retrieval.QuerySet.groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).distinct.toSet }
    val got = Retrieval.q199RetrievalEval(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == byQuery.keySet)
    byQuery.foreach { case (q, terms) =>
      val rel = docTokens.filter { case (_, ts) => terms.subsetOf(ts) }.keySet
      val top = ranked.filter(_._1 == q).sortBy(_._2).map(_._3)
      val hits = top.count(rel)
      val firstRel = top.zipWithIndex.collectFirst {
        case (d, i) if rel(d) => i + 1L }
      val (nT, nR, h, recall, rr) = got(q)
      assert(nT == terms.size && nR == rel.size && h == hits)
      assert(recall == hits * 1000000L / math.max(rel.size, 1))
      assert(rr == firstRel.map(1000000L / _).getOrElse(0L))
    }
  }

  test("q199 on a crafted corpus: perfect and partial retrieval score correctly") {
    val docs = Seq(
      (1L, "spark join fast"),          // relevant to query 1 (spark+join)
      (2L, "spark join slow"),          // relevant to query 1
      (3L, "spark only here"),          // not relevant (missing 'join')
      (4L, "window merge x"),           // relevant to query 2
      (5L, "nothing at all"))
      .toDF("doc_id", "text")
    val got = Retrieval.evalDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // query 1: 2 relevant docs, both must sit in the top-5 of a
    // 5-document corpus → recall 1e6; first relevant at rank 1 or 2
    val (nR1, h1, rec1, rr1) = got(1L)
    assert(nR1 == 2L && h1 == 2L && rec1 == 1000000L)
    assert(rr1 == 1000000L || rr1 == 500000L)
    // query 2: exactly one relevant doc, found
    val (nR2, h2, rec2, _) = got(2L)
    assert(nR2 == 1L && h2 == 1L && rec2 == 1000000L)
    // query 3 (customer+batch+query): nothing relevant in this corpus
    val (nR3, h3, rec3, rr3) = got(3L)
    assert(nR3 == 0L && h3 == 0L && rec3 == 0L && rr3 == 0L)
  }

  test("q251 nDCG/MRR reconcile against a hand-computed tiny fixture") {
    // query 1 = {spark, join} (n_terms = 2). Candidates: doc 10 matches
    // both (gain 2), docs 11/12 match one each (gain 1). A ranking that
    // puts the gain-1 doc first, the gain-2 doc second, and an
    // irrelevant doc third:
    //   DCG  = 1·disc(1) + 2·disc(2) + 0 = 1000000 + 2·630930 = 2261860
    //   IDCG = 2·disc(1) + 1·disc(2) + 1·disc(3)
    //        = 2000000 + 630930 + 500000 = 3130930
    //   nDCG = (2261860·10⁶) div 3130930;  RR = 10⁶ div 2 (first FULL
    //   match, gain = n_terms, sits at rank 2)
    val matched = Seq((10L, "spark"), (10L, "join"), (11L, "spark"),
      (12L, "join")).toDF("doc_id", "token")
    val ranked = Seq(("s", 1L, 1L, 11L), ("s", 1L, 2L, 10L), ("s", 1L, 3L, 99L))
      .toDF("system", "query_id", "rnk", "doc_id")
    val out = Retrieval.qualityOver(spark, ranked, matched,
        systems = Seq("s"), queryIds = Seq(1L)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val dcg = 1000000L + 2L * 630930L
    val idcg = 2L * 1000000L + 630930L + 500000L
    val ndcg = dcg * 1000000L / idcg
    assert(out == Seq(
      ("s", -1L, dcg, idcg, ndcg, 500000L),
      ("s", 1L, dcg, idcg, ndcg, 500000L)))
  }

  test("q251 means average over the FULL query grid, scoring silent queries 0") {
    // system "s" ranks query 1 ({spark, join}) perfectly but emits
    // NOTHING for query 2: the mean must average over both queries
    // (ndcg (1e6+0)/2), not just the one that produced rows — the
    // round-14 advisor's skew.
    val matched = Seq((10L, "spark"), (10L, "join")).toDF("doc_id", "token")
    val ranked = Seq(("s", 1L, 1L, 10L)).toDF("system", "query_id", "rnk", "doc_id")
    val out = Retrieval.qualityOver(spark, ranked, matched,
        systems = Seq("s"), queryIds = Seq(1L, 2L)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // query 1: doc 10 gain 2 at rank 1 → dcg = idcg = 2000000, ndcg 1e6,
    // rr 1e6. query 2: no ranked rows → all-zero row, present and counted.
    assert(out == Seq(
      ("s", -1L, 2000000L, 2000000L, 500000L, 500000L),
      ("s", 1L, 2000000L, 2000000L, 1000000L, 1000000L),
      ("s", 2L, 0L, 0L, 0L, 0L)))
  }

  test("q251 discount table is the rounded-micros log2 law") {
    // the literal table both engines join must BE round(1e6/log2(r+1)),
    // computed via StrictMath (bit-reproducible fdlibm) so the table —
    // and every committed hash — cannot shift across JVMs/platforms
    Retrieval.DcgDiscMicro.foreach { case (r, d) =>
      assert(d == math.round(1e6 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))))
    }
    assert(Retrieval.DcgDiscMicro.take(3).map(_._2) ==
      Seq(1000000L, 630930L, 500000L))
  }

  test("q214: phrase hits are adjacency-and-order exact, positions 0-based") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),      // 'a b' at 0 and 2; 'b a' at 1 and 3
      (2L, "b a c a b"),      // 'b a' at 0; 'a b' at 3
      (3L, "a c b"),          // co-present but never adjacent: no hits
      (4L, "a"))              // single token: no bigrams
      .toDF("doc_id", "text")
    val phrases = Seq("a b", "b a").toDF("phrase")
    val got = Retrieval.phraseHits(docs, phrases).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("a b", 1L)) == ((2L, 0L)), "overlapping occurrences both count")
    assert(got(("b a", 1L)) == ((2L, 1L)))
    assert(got(("a b", 2L)) == ((1L, 3L)))
    assert(got(("b a", 2L)) == ((1L, 0L)))
    assert(!got.contains(("a b", 3L)), "co-presence without adjacency is not a hit")
    assert(got.size == 4)
  }

  test("q214 on the corpus: every hit doc really contains its phrase") {
    val hits = Retrieval.q214PhraseSearch(spark, sf).collect()
    assert(hits.nonEmpty, "top-PMI phrases must occur somewhere (cb >= PmiMinPair)")
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach { r =>
      val (phrase, doc) = (r.getString(0), r.getLong(1))
      val toks = docs(doc).split(" ").filter(_.nonEmpty)
      val found = toks.sliding(2).exists(_.mkString(" ") == phrase)
      assert(found, s"doc $doc reported for '$phrase' but has no adjacent occurrence")
    }
  }
}
