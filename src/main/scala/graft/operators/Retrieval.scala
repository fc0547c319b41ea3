package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Full-text retrieval over the corpus: BM25-ranked top-k per query — the
  * inverted-index search shape (Lucene/Elasticsearch scoring; Robertson &
  * Zaragoza 2009) expressed relationally, the way a Spark-resident corpus
  * serves ad-hoc "find me training docs about X" queries without an
  * external search cluster.
  *
  * Scale shape: the exploded token stream is filtered to the QUERY
  * VOCABULARY before any shuffle (a literal IN list — broadcast-free,
  * codegen'd), so the one aggregation shuffles only query-term
  * occurrences, never the corpus token stream. Document length rides the
  * explode (no corpus-sized join-back), corpus-level scalars (N, avgdl)
  * come from a 1-row aggregate cross-joined in, and the final ranking is
  * a per-query top-k window over candidate docs only.
  *
  * Oracle parity: per-term BM25 contributions are computed in double but
  * fixed to integer MICROS (round(contrib·10⁶) as BIGINT) before the
  * per-(query, doc) sum — integer addition is order-free, so the
  * engine's aggregation order can never flip a rank tie, and ranking on
  * the exact micro total (then doc_id) is fully deterministic across
  * engines. */
object Retrieval {

  /** BM25 constants (the classic defaults). Every constant reaches BOTH
    * engines as a parsed DECIMAL LITERAL derived from these two values —
    * runtime arithmetic like `k1 + 1` can land a half-ulp from the
    * literal `2.2` and break bit parity, so the derived literals are
    * computed once in exact decimal and rendered into the Spark plan and
    * the oracle SQL from the same strings (editing K1/B updates both
    * engines together; they cannot drift). */
  val K1 = BigDecimal("1.2")
  val B = BigDecimal("0.75")
  private val K1Plus1Lit = (K1 + 1).toString  // tf numerator factor
  private val K1Lit = K1.toString
  private val OneMinusBLit = (1 - B).toString
  private val BLit = B.toString

  val TopK = 10

  /** Fixture query set (terms from the synthetic corpus vocabulary). */
  val QuerySet: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join",
    2L -> "window", 2L -> "merge",
    3L -> "customer", 3L -> "batch", 3L -> "query")

  /** BM25 top-k docs per query over any (doc_id, text) frame.
    * `queries` is (query_id, term) — one row per query term. */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, String)], k: Int): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val d = docs.select(col("doc_id"), toks.as("toks"), size(toks).cast("long").as("dl"))
    // corpus scalars: one tiny row, broadcast by the cross join
    val stats = d.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n"))
    bm25Core(d.select(col("doc_id"), col("dl"), explode(col("toks")).as("token")),
      stats, queries, k)
  }

  /** Scoring core over a pre-tokenized occurrence stream
    * `(doc_id, dl, token)` + a 1-row `(avgdl, n)` stats frame. */
  private def bm25Core(tok: DataFrame, stats: DataFrame,
      queries: Seq[(Long, String)], k: Int): DataFrame = {
    val spark = tok.sparkSession
    import spark.implicits._
    val terms = queries.map(_._2).distinct
    // query-vocabulary filter BEFORE the aggregation shuffle
    val tf = tok
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // document frequency as a window over the ALREADY-AGGREGATED tf frame
    // (candidate docs × query terms — small): deriving it with a second
    // groupBy + join-back would replan the whole explode subtree and scan
    // the corpus a second time
    val tfdf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy("token")))
    val q = queries.toDF("query_id", "term")
    val contrib = q
      .join(tfdf, q("term") === tfdf("token"))
      .crossJoin(broadcast(stats))
      .select(
        col("query_id"), col("doc_id"),
        round(
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(K1Plus1Lit.toDouble)) /
            (col("tf") + lit(K1Lit.toDouble) *
              (lit(OneMinusBLit.toDouble) + lit(BLit.toDouble) * col("dl") / col("avgdl"))) *
            lit(1000000)).cast("long").as("contrib"))
    val agg = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("micro"))
    val w = Window.partitionBy("query_id").orderBy(col("micro").desc, col("doc_id"))
    agg
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(
        col("query_id"), col("rnk").cast("long").as("rnk"), col("doc_id"),
        round(col("micro") / lit(1000000.0), 4).as("score"))
      .orderBy("query_id", "rnk")
  }

  /** q70 — BM25 over [[QuerySet]], sourced from the shared
    * [[TextOps.tokenStage]]: the occurrence stream, document lengths AND
    * the corpus scalars (N, avgdl) all derive from the one cached
    * tokenize pass (the stage's token-less-doc marker rows keep N and
    * avgdl exact over the full corpus). [[bm25TopK]] stays as the
    * generic any-frame entry point for the `bm25` TVF. */
  def q70Bm25(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    val stage = TextOps.tokenStage(spark, dir)
    val perDoc = stage.groupBy("doc_id").agg(max(col("dl")).as("dl"))
    val stats = perDoc.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n"))
    bm25Core(
      stage.filter(col("token").isNotNull).select(col("doc_id"), col("dl"), col("token")),
      stats, QuerySet, TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_bm25" -> (q70Bm25 _))

  private val valuesSql =
    QuerySet.map { case (id, t) => s"($id, '$t')" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "q70_bm25" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
         |stats AS (
         |  SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, count(*) AS n
         |  FROM dd),
         |q(query_id, term) AS (VALUES $valuesSql),
         |tf AS (
         |  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
         |  FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dd) u
         |  WHERE token IN (SELECT DISTINCT term FROM q)
         |  GROUP BY doc_id, token),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |contrib AS (
         |  SELECT q.query_id, tf.doc_id,
         |    CAST(round(
         |      ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
         |        (tf.tf * $K1Plus1Lit) /
         |        (tf.tf + $K1Lit * ($OneMinusBLit + $BLit * tf.dl / stats.avgdl)) *
         |      1000000) AS BIGINT) AS contrib
         |  FROM q JOIN tf ON q.term = tf.token JOIN df ON df.token = tf.token, stats),
         |agg AS (
         |  SELECT query_id, doc_id, sum(contrib) AS micro
         |  FROM contrib GROUP BY query_id, doc_id),
         |r AS (
         |  SELECT query_id, doc_id, micro,
         |    row_number() OVER (PARTITION BY query_id ORDER BY micro DESC, doc_id) AS rnk
         |  FROM agg)
         |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rnk,
         |  doc_id, round(micro / 1000000.0, 4) AS score
         |FROM r WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin)
}
