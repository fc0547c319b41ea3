package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** MARGIN-BASED PAIR MINING (SURVEY §2.9 similarity family, beside
  * q156 hard negatives): mine aligned pairs across two halves of the
  * corpus with the RATIO-MARGIN criterion of large-scale bitext mining
  * (Artetxe & Schwenk 2019 "Margin-based Parallel Corpus Mining";
  * the CCMatrix/LASER pipeline): a candidate (x, y) is kept not for
  * its absolute cosine but for how much it stands out against each
  * side's other neighbors —
  * margin(x, y) = 2·cos(x, y) / (avgTopK(x→B) + avgTopK(y→A)).
  * Absolute-threshold mining drowns in hubness (dense regions pass
  * everything); the margin normalizes by local density, which is why
  * every production bitext miner uses it. Here the two "languages" are
  * the deterministic vec_id-parity halves of the embedding corpus —
  * the same split-fixture convention as q123's leakage probe.
  *
  * Scale regime: this is the EXACT miner — the all-pairs scores ARE
  * the mining criterion's ground truth, and the fixture-sized run
  * gates the arithmetic end-to-end (the q31/q156 exact-twin
  * convention; deliberately quadratic, excluded from the 10× sweep).
  * At 100 TB the candidate stream comes from the q43 IVF index run
  * from BOTH sides (each x scores only its probed lists, fwd/bwd
  * top-K sums are computed over those candidates) and this SAME
  * margin-and-rank tail runs over it — exactly the q29→q43
  * relationship, with the margin denominator then an approximation
  * whose recall the index's own q43/q162 gates bound.
  *
  * Parity: cosines are fixed to half-away integer micros BEFORE any
  * sum or ranking; top-K sums are integer; the margin is one
  * truncating integer division of positive integers — no float ever
  * crosses an ordering boundary in either engine.
  */
object Margin {

  /** Neighborhood size of the margin denominator (top-K cosine sums on
    * each side — K=4 is the LASER operating point's order). */
  val MarginK = 4

  /** Mining threshold in margin micros (1e6 = a pair exactly at its
    * neighborhood average). 310000 admits roughly the top decile of
    * per-anchor best margins on the fixtures. */
  val MarginTauMicro = 310000L

  /** q191 — mined pair report: each side-A anchor's best-margin side-B
    * partner, kept where the margin clears [[MarginTauMicro]]. */
  def q191MarginMining(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    minedPairs(Tables.embeddings(spark, dir))
  }

  /** The miner over ANY (vec_id, embedding) frame — also the
    * `margin_pairs()` TVF body. */
  private[graft] def minedPairs(emb: DataFrame): DataFrame = {
    val a = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("va"))
    val b = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("b_id"), col("embedding").as("vb"))
    // the exact candidate grid (the documented quadratic gate regime);
    // only positive-cosine candidates participate — a negative cosine
    // is never a mining candidate and keeps the integer margin
    // arithmetic sign-free
    val pairs = a.crossJoin(b)
      .select(col("a_id"), col("b_id"),
        KMeans.halfAway(lit(1e6) *
          Similarity.cosine(col("va"), col("vb"))).as("cm"))
      .filter(col("cm") > 0)
    val wf = Window.partitionBy("a_id").orderBy(col("cm").desc, col("b_id"))
    val fwd = pairs.withColumn("rn", row_number().over(wf))
      .filter(col("rn") <= MarginK)
      .groupBy("a_id").agg(sum(col("cm")).as("fs"))
    val wb = Window.partitionBy("b_id").orderBy(col("cm").desc, col("a_id"))
    val bwd = pairs.withColumn("rn", row_number().over(wb))
      .filter(col("rn") <= MarginK)
      .groupBy("b_id").agg(sum(col("cm")).as("bs"))
    val margined = pairs
      .join(fwd, Seq("a_id")).join(bwd, Seq("b_id"))
      .withColumn("margin_micro", expr("(2 * cm * 1000000) div (fs + bs)"))
    val best = Window.partitionBy("a_id")
      .orderBy(col("margin_micro").desc, col("b_id"))
    margined
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1 && col("margin_micro") >= MarginTauMicro)
      .select(col("a_id"), col("b_id"),
        col("cm").as("cos_micro"), col("margin_micro"))
      .orderBy("a_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_margin_mining" -> (q191MarginMining _))

  /** Full value oracle: the whole miner replayed — micro cosines, both
    * top-K neighborhood sums, the truncating-division margin, the
    * best-per-anchor ranking and the threshold. */
  val oracles: Map[String, String] = Map(
    "q191_margin_mining" -> {
      val cos = "1000000.0 * list_dot_product(a.ve, b.ve) / " +
        "sqrt(list_dot_product(a.ve, a.ve) * list_dot_product(b.ve, b.ve))"
      s"""WITH v AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
         |p AS MATERIALIZED (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ${KMeans.halfAwaySql(cos)} AS cm
         |  FROM v a, v b
         |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
         |pp AS MATERIALIZED (SELECT * FROM p WHERE cm > 0),
         |fwd AS (
         |  SELECT a_id, sum(cm) AS fs FROM (
         |    SELECT a_id, cm, row_number() OVER (
         |      PARTITION BY a_id ORDER BY cm DESC, b_id) AS rn FROM pp)
         |  WHERE rn <= $MarginK GROUP BY a_id),
         |bwd AS (
         |  SELECT b_id, sum(cm) AS bs FROM (
         |    SELECT b_id, cm, row_number() OVER (
         |      PARTITION BY b_id ORDER BY cm DESC, a_id) AS rn FROM pp)
         |  WHERE rn <= $MarginK GROUP BY b_id),
         |m AS (
         |  SELECT pp.a_id, pp.b_id, pp.cm,
         |    (2 * pp.cm * 1000000) // (fs + bs) AS margin_micro,
         |    row_number() OVER (PARTITION BY pp.a_id
         |      ORDER BY (2 * pp.cm * 1000000) // (fs + bs) DESC, pp.b_id) AS rn
         |  FROM pp JOIN fwd USING (a_id) JOIN bwd USING (b_id))
         |SELECT a_id, b_id, CAST(cm AS BIGINT) AS cos_micro,
         |  CAST(margin_micro AS BIGINT) AS margin_micro
         |FROM m WHERE rn = 1 AND margin_micro >= $MarginTauMicro
         |ORDER BY a_id""".stripMargin
    })
}
