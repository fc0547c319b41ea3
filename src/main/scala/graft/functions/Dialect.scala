package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Ascending, Cast, Expression, Literal, ParseToTimestamp, SortOrder, StringInstr}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AnyValue, HyperLogLogPlusPlus, ListAgg}
import org.apache.spark.sql.types.TimestampType
import org.apache.spark.unsafe.types.UTF8String

/** Presto/Athena dialect shims (SURVEY §2.7 X2, §2.3 A10; extended to
  * the migration pack — `date_parse`, `from_iso8601_timestamp`,
  * `approx_distinct`, `arbitrary` — in round 15, gated by q253).
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

  /** Presto's `approx_distinct` default max standard error (its
    * documented 2.3%), mapped directly onto Spark's HLL++ `rsd`. */
  val ApproxDistinctDefaultRsd = 0.023

  /** MySQL-style format (Presto `date_parse`, MySQL `STR_TO_DATE`) →
    * Java `DateTimeFormatter` pattern. Presto's format language is
    * MySQL's `%`-directives; Spark's parser speaks Java patterns — a
    * name-only shim would silently MISPARSE every format string (e.g.
    * `%m` month read as Java literal `m`), which is worse than missing.
    * Translation happens once at plan time on the literal format (the
    * universal case in real queries); an unsupported directive throws
    * instead of guessing. Alphabetic literal runs are quoted so the
    * Java pattern language cannot reinterpret them. */
  private[functions] def mysqlToJavaPattern(fmt: String): String = {
    val sb = new StringBuilder
    val plain = new StringBuilder
    def flush(): Unit = {
      val s = plain.result(); plain.clear()
      if (s.nonEmpty) {
        if (s.exists(_.isLetter)) sb.append('\'').append(s.replace("'", "''")).append('\'')
        else sb.append(s)
      }
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        flush()
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'c' => sb.append("M")
          case 'd' => sb.append("dd")
          case 'e' => sb.append("d")
          case 'H' => sb.append("HH")
          case 'k' => sb.append("H")
          case 'h' | 'I' => sb.append("hh")
          case 'l' => sb.append("h")
          case 'i' => sb.append("mm")
          case 's' | 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'p' => sb.append("a")
          case 'j' => sb.append("DDD")
          case 'a' => sb.append("EEE")
          case 'W' => sb.append("EEEE")
          case 'b' => sb.append("MMM")
          case 'M' => sb.append("MMMM")
          case 'T' => sb.append("HH:mm:ss")
          case 'r' => sb.append("hh:mm:ss a")
          case '%' => plain.append('%')
          case other => throw new IllegalArgumentException(
            s"date_parse: unsupported MySQL format directive '%$other'")
        }
        i += 2
      } else { plain.append(c); i += 1 }
    }
    flush()
    sb.result()
  }

  /** Builders for the migration-pack names, shared between
    * [[register]] (programmatic/late install) and
    * [[GraftExtensions]] (config-driven install) so the two paths
    * cannot drift. */
  private[functions] val dateParseBuilder: Seq[Expression] => Expression = {
    case Seq(str, Literal(fmt: UTF8String, _)) =>
      new ParseToTimestamp(str, Literal(mysqlToJavaPattern(fmt.toString)))
    case _ => throw new IllegalArgumentException(
      "date_parse expects (string, <MySQL-format string literal>)")
  }

  private[functions] val fromIso8601Builder: Seq[Expression] => Expression = {
    // ISO 8601 parse is exactly Spark's string→timestamp cast
    case Seq(s) => Cast(s, TimestampType)
    case _ => throw new IllegalArgumentException(
      "from_iso8601_timestamp expects (string)")
  }

  private[functions] val approxDistinctBuilder: Seq[Expression] => Expression = {
    // Presto's default max standard error, not Spark's (0.05)
    case Seq(c) => new HyperLogLogPlusPlus(c, ApproxDistinctDefaultRsd, 0, 0)
    case Seq(c, e) => new HyperLogLogPlusPlus(c, e)
    case _ => throw new IllegalArgumentException(
      "approx_distinct expects (col) or (col, max_standard_error)")
  }

  private[functions] val arbitraryBuilder: Seq[Expression] => Expression = {
    case Seq(c) => new AnyValue(c)
    case _ => throw new IllegalArgumentException("arbitrary expects (col)")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    // idempotency guard must cover EVERY name registered below — a guard
    // on a subset would skip the rest whenever the subset pre-exists
    // (e.g. a future Spark builtin strpos)
    if (Seq("strpos", "string_agg", "date_parse", "from_iso8601_timestamp",
            "approx_distinct", "arbitrary",
            "cosine_sim", "simhash_agg", "simhash64", "minhash_sigs",
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

    // —— the Presto/Athena migration pack (round-14 verdict item 3):
    // the names an Athena user's first-week queries actually carry
    // (the reference's user language is sql/sample_athena_queries.sql).
    // Every shim is a NATIVE Catalyst expression — codegen'd scalar or
    // partial-aggregating AggregateFunction; no UDF anywhere. Names
    // Presto and Spark already share (element_at, split_part, try_cast,
    // date_trunc, bool_and) need no shim and are spec-gated as-is.
    reg.createOrReplaceTempFunction("date_parse", dateParseBuilder, "built-in")
    reg.createOrReplaceTempFunction(
      "from_iso8601_timestamp", fromIso8601Builder, "built-in")
    reg.createOrReplaceTempFunction(
      "approx_distinct", approxDistinctBuilder, "built-in")
    reg.createOrReplaceTempFunction("arbitrary", arbitraryBuilder, "built-in")

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
