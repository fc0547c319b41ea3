package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, Literal, SortOrder, StringInstr}
import org.apache.spark.sql.catalyst.expressions.aggregate.ListAgg

/** Presto/Athena dialect shims (SURVEY §2.7 X2, §2.3 A10).
  *
  * The reference's SQL corpus uses two function names Spark SQL doesn't
  * ship under the same name:
  *
  *  - `strpos(string, substring)` (reference `sql/sample_athena_queries.sql:45,49`)
  *    — identical semantics to Spark's `instr` (1-based, 0 when absent),
  *    so the shim is a thin [[StringInstr]] registration, fully
  *    codegen'd; no UDF, no performance cliff.
  *  - `string_agg(expr, sep)` (reference `sql/sample_athena_queries.sql:194`)
  *    — Spark 4 ships the same aggregate as `listagg`. The shim registers
  *    the Presto name over the native [[ListAgg]] aggregate, with a
  *    deterministic `ORDER BY expr` (the reference query doesn't pin an
  *    order; we pin one so results are reproducible and oracle-checkable).
  *
  * Registration is per-session and idempotent (`createOrReplaceTempFunction`).
  * Both shims are native Catalyst expressions — they inherit whole-stage
  * codegen and partial aggregation, which is what makes them safe in a
  * 100 TB plan (a Scala UDF here would break codegen in every projection
  * that mentions them).
  */
object Dialect {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    // idempotency guard must cover EVERY name registered below — a guard
    // on a subset would skip the rest whenever the subset pre-exists
    // (e.g. a future Spark builtin strpos)
    if (Seq("strpos", "string_agg", "cosine_sim", "simhash_agg", "simhash64", "minhash_sigs",
            "rolling_hash", "deflate_ratio")
          .forall(n => reg.functionExists(FunctionIdentifier(n)))) return

    reg.createOrReplaceTempFunction(
      "strpos",
      { case Seq(str, sub) => StringInstr(str, sub) }: PartialFunction[Seq[Expression], Expression],
      "built-in")

    reg.createOrReplaceTempFunction(
      "string_agg",
      { exprs: Seq[Expression] =>
        val (child, delim) = exprs match {
          case Seq(c)    => (c, Literal(","))
          case Seq(c, d) => (c, d)
          case _ => throw new IllegalArgumentException(
            s"string_agg expects 1 or 2 arguments, got ${exprs.size}")
        }
        ListAgg(child, delim, Seq(SortOrder(child, Ascending)))
      },
      "built-in")

    // graft-native extension functions, exposed to the SQL surface:
    reg.createOrReplaceTempFunction(
      "cosine_sim",
      { case Seq(a, b) => CosineSimilarity(a, b) }: PartialFunction[Seq[Expression], Expression],
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash_agg",
      { case Seq(h) => SimhashAgg(h) }: PartialFunction[Seq[Expression], Expression],
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64",
      { case Seq(h) => Simhash64(h) }: PartialFunction[Seq[Expression], Expression],
      "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_hash",
      { case Seq(t) => RollingHash64(t) }: PartialFunction[Seq[Expression], Expression],
      "built-in")
    reg.createOrReplaceTempFunction(
      "deflate_ratio",
      { case Seq(t) => DeflateRatio(t) }: PartialFunction[Seq[Expression], Expression],
      "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sigs",
      { exprs: Seq[Expression] =>
        exprs match {
          case Seq(h, Literal(n: Int, org.apache.spark.sql.types.IntegerType)) =>
            MinhashSigs(h, n)
          case _ => throw new IllegalArgumentException(
            "minhash_sigs expects (array<bigint>, <int literal>)")
        }
      },
      "built-in")
  }
}
