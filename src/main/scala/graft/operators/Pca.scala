package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Principal-component extraction over the embedding corpus: one
  * distributed mean pass, one distributed covariance pass, then power
  * iteration on the driver over the collected dim×dim matrix — the
  * parameter-server split a 100 TB embedding table forces: the
  * corpus-sized work (two map-side-combined aggregates whose output is
  * dim- and dim²-sized respectively) is distributed; the dim×dim eigen
  * step is microseconds on any machine and gains nothing from a
  * cluster. The dominant component is what an embedding-curation
  * pipeline extracts before whitening, anisotropy correction ("all
  * embeddings share a huge common direction" — Mu & Viswanath 2018,
  * all-but-the-top), or 1-D projection indexes.
  *
  * INTEGER-EXACT end to end (the q130 contract): micro-quantized
  * vectors, integer means (floor), per-row micro-rounded centered
  * products, covariance normalized by floor(sum/n) so matrix entries
  * are n-independent-bounded (no overflow at any corpus scale), and
  * power-iteration rescaling to ±1e6 by max-|component| each round.
  * The oracle replays the whole pipeline — both passes and all
  * [[PowerIters]] matrix-vector rounds — in unrolled SQL from the same
  * constants, so the result hash-matches, not approximately-matches.
  */
object Pca {

  /** Embedding dimensionality of the corpus fixtures. */
  val Dim = 64

  /** Power-iteration rounds (unrolled in the oracle SQL). Convergence
    * is geometric in λ₂/λ₁ — the fixture spectrum is flat-ish (clustered
    * embeddings), so the count is sized for it: 24 rounds align the
    * engine component with a 200-round double-precision reference at
    * |cos| > 0.99 (spec-checked). Each round is a dim-sized
    * matrix-vector product — driver-trivial, oracle-unrollable. */
  val PowerIters = 24

  /** q133 — DOMINANT PRINCIPAL COMPONENT: (i, loading_micro) per
    * dimension, the unit-ish (∞-norm = 1e6) dominant eigenvector of the
    * micro-covariance matrix. */
  def q133PcaPower(spark: SparkSession, dir: String): DataFrame = {
    Sessions.prepare(spark)
    val q = KMeans.quantized(spark, dir).persist()
    try {
      // pass 1: per-dim integer means — dim-sized aggregate, bounded
      // dim-row collect (the parameter-server state)
      val meanRows = q.select(posexplode(col("em")).as(Seq("i", "v")))
        .groupBy("i").agg(floor(sum(col("v")) / count(lit(1))).cast("long").as("mu"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val mu: Array[Long] = meanRows.map(_._2)
      val muLit = array(mu.map(lit(_)): _*)
      // pass 2: upper-triangle centered second moments, micro-rounded
      // per row so the sum stays in int64 at any corpus size; the
      // explode is dim²/2 structs per row, map-side combined down to
      // dim²/2 rows per partition before the one shuffle
      val pairs = flatten(transform(sequence(lit(1), lit(Dim)), i =>
        transform(sequence(i, lit(Dim)), j =>
          struct(i.as("i"), j.as("j"),
            round((element_at(col("em"), i) - element_at(muLit, i)) *
              (element_at(col("em"), j) - element_at(muLit, j)) / 1e6)
              .cast("long").as("p")))))
      val cov = q.select(explode(pairs).as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
        .groupBy("i", "j").agg(sum(col("p")).as("s"), count(lit(1)).as("n"))
        .select(col("i"), col("j"), floor(col("s") / col("n")).cast("long").as("c"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      // dense symmetric matrix from the triangle
      val m = Array.tabulate(Dim, Dim) { (a, b) =>
        val (i, j) = (math.min(a, b) + 1, math.max(a, b) + 1)
        cov.getOrElse((i, j), 0L)
      }
      // power iteration, integer arithmetic identical to the SQL replay:
      // w = M·v; v' = round(1e6 · w / max|w|)
      // round-half-away-from-zero, matching the SQL round() on both
      // engines (math.round is half-UP — it disagrees at negative .5)
      def rnd(y: Double): Long =
        (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
      var v = Array.tabulate(Dim)(i => if (i == 0) 1000000L else 0L)
      (1 to PowerIters).foreach { _ =>
        val w = Array.tabulate(Dim)(i =>
          (0 until Dim).map(j => m(i)(j) * v(j)).sum)
        val norm = w.map(math.abs).max.toDouble
        v = w.map(x => rnd(1e6 * x / norm))
      }
      import spark.implicits._
      v.zipWithIndex.map { case (l, i) => (i + 1, l) }.toSeq
        .toDF("i", "loading_micro").orderBy("i")
    } finally { q.unpersist(); () }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_pca_power" -> (q133PcaPower _))

  val oracles: Map[String, String] = Map("q133_pca_power" -> oracleSql)

  /** Means, micro-covariance and all [[PowerIters]] matrix-vector
    * rounds unrolled in SQL off the same constants as the plan. */
  private def oracleSql: String = {
    def round(n: Int) =
      s"""w$n AS (
         |  SELECT m.i, sum(m.c * v.l) AS w
         |  FROM m JOIN v${n - 1} v ON m.j = v.i GROUP BY m.i),
         |x$n AS (SELECT max(abs(w)) AS mx FROM w$n),
         |v$n AS (
         |  SELECT i, CAST(round(1000000.0 * w / mx) AS BIGINT) AS l
         |  FROM w$n, x$n)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS em
       |  FROM embeddings),
       |u AS (
       |  SELECT i, v FROM (
       |    SELECT unnest(em) AS v, unnest(range(1, ${Dim + 1})) AS i FROM e)),
       |mu AS (
       |  SELECT i, CAST(floor(sum(v) * 1.0 / count(*)) AS BIGINT) AS mu
       |  FROM u GROUP BY i),
       |tri AS (
       |  SELECT t1.i AS i, t2.j AS j,
       |    sum(CAST(round((e.em[t1.i] - m1.mu) * (e.em[t2.j] - m2.mu) / 1000000.0)
       |      AS BIGINT)) AS s,
       |    count(*) AS n
       |  FROM e,
       |    range(1, ${Dim + 1}) t1(i),
       |    range(1, ${Dim + 1}) t2(j),
       |    mu m1, mu m2
       |  WHERE m1.i = t1.i AND m2.i = t2.j AND t2.j >= t1.i
       |  GROUP BY 1, 2),
       |half AS (SELECT i, j, CAST(floor(s * 1.0 / n) AS BIGINT) AS c FROM tri),
       |m AS (
       |  SELECT i, j, c FROM half
       |  UNION ALL
       |  SELECT j, i, c FROM half WHERE i <> j),
       |v0 AS (
       |  SELECT i, CASE WHEN i = 1 THEN 1000000 ELSE 0 END AS l
       |  FROM range(1, ${Dim + 1}) t(i)),
       |${(1 to PowerIters).map(round).mkString(",\n")}
       |SELECT CAST(i AS INTEGER) AS i, l AS loading_micro
       |FROM v$PowerIters ORDER BY i""".stripMargin
  }
}
