package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint over the UTF-8 bytes of a string
  * (SURVEY §2.9 "document fingerprinting (rolling hash)"):
  * h = fold(bytes, 0, (acc, b) → (acc·31 + b) mod 1e9+7), bytes taken
  * unsigned. Empty input → 0.
  *
  * Why a custom expression: the composable form recovers each byte from
  * `hex(cast(text as binary))` with a `substr`+`conv` pair inside an
  * `aggregate` lambda — O(bytes) interpreted higher-order-function steps
  * per document, and the hex detour materializes a 2× copy of every
  * document. This is the one map stage in the text family that didn't
  * codegen; here it is a single tight byte loop inside whole-stage
  * codegen (pattern: [[MinhashSigs]]).
  *
  * Numeric contract (oracle parity): identical recurrence, operand order
  * and modulus as the composable form and the DuckDB oracle (`list_reduce`
  * over hex-recovered bytes) — every intermediate stays < 3.3e10, so
  * ANSI-mode overflow checking never fires and values match bit-for-bit
  * including non-ASCII text.
  */
case class RollingHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xFFL)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $a.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xFFL)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** Deflate helper shared by interpreted eval and generated code — the
  * compression itself is zlib (JNI); codegen only removes the expression
  * interpreter around it. */
object DeflateUtil {
  /** Length of the DEFLATE stream for `bytes` at default level. */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  /** compressed/original byte ratio; empty input → 1.0 (incompressible
    * by convention — empty docs should not look like high-quality text). */
  def ratio(bytes: Array[Byte]): Double =
    if (bytes.isEmpty) 1.0 else deflatedLen(bytes).toDouble / bytes.length
}

/** Compression-ratio quality signal (SURVEY §2.9 "quality scoring"):
  * deflate(bytes).length / bytes.length over the document's UTF-8 bytes.
  * Highly repetitive/templated text (boilerplate, scraped junk, token
  * floods) compresses far below natural prose — the classic
  * cheap-and-robust corpus filter signal (used alongside length/stopword
  * heuristics; see Gopher/CCNet-style quality pipelines in PAPERS.md).
  * Map-only, row-local, deterministic for a given zlib. Not
  * oracle-checkable (the oracle engine has no deflate) → spec-validated
  * against a direct JVM computation and on planted repetitive/random
  * fixtures. */
case class DeflateRatio(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateUtil.ratio(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateUtil.ratio($a.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Shingle-hash helper shared by interpreted eval and generated code:
  * one tight byte loop per document replacing the four-stage
  * higher-order-function chain
  * `transform(array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', slice(tokens, i, k)))), s -> xxhash64(s))` — none of
  * whose lambdas participate in whole-stage codegen, and which
  * materializes every shingle string twice (once for the distinct,
  * once for the hash).
  *
  * Semantics contract (spec-gated bit-identical to the composable
  * chain, [[graft.operators.Dedup.shingleArray]]):
  *  - tokens = non-empty segments of the text split on single spaces
  *    (Spark's `split(text, " ")` + non-empty filter);
  *  - shingles = the k-token windows joined by ONE space (so runs of
  *    spaces in the input collapse exactly as `concat_ws` does), with
  *    `max(nTokens − k + 1, 1)` windows — zero/short token lists give
  *    one (possibly empty / short) shingle;
  *  - hashes = Spark `xxhash64` (seed 42) of each shingle string;
  *  - distinct keeps the FIRST occurrence, deduplicating BY HASH —
  *    identical to string-distinct-then-hash unless two distinct
  *    shingles of one document collide in 64 bits (engine-local
  *    hashes; the family's LSH error budget already dwarfs 2⁻⁶⁴).
  */
object ShingleUtil {

  /** Spark's `xxhash64` default seed. */
  val Seed = 42L

  def hashes(text: UTF8String, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    // token boundaries: [start, end) pairs over the byte array — a
    // space byte (0x20) never occurs inside a UTF-8 multi-byte sequence
    var nTok = 0
    val starts = new Array[Int](n / 2 + 1)
    val ends = new Array[Int](n / 2 + 1)
    var i = 0
    while (i < n) {
      if (bytes(i) != ' ') {
        starts(nTok) = i
        while (i < n && bytes(i) != ' ') i += 1
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    val nWin = math.max(nTok - k + 1, 1)
    val buf = new Array[Byte](n + k)
    val out = new Array[Long](nWin)
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    var nOut = 0
    var w = 0
    while (w < nWin) {
      var len = 0
      val last = math.min(w + k, nTok) - 1
      var t = w
      while (t <= last) {
        if (t > w) { buf(len) = ' '; len += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, len, tl)
        len += tl
        t += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, Seed)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      w += 1
    }
    if (nOut == nWin) out else java.util.Arrays.copyOf(out, nOut)
  }
}

/** Distinct k-word shingle xxhash64 signature of a document as ONE
  * codegen'd expression — the native entry of the whole dedup family's
  * hot loop (`Dedup.sigsOf`; feeds [[MinhashSigs]], band bucketing,
  * exact-Jaccard verification, decontamination membership). See
  * [[ShingleUtil]] for the semantics contract and why the composable
  * chain was the bottleneck. */
case class ShingleXxhashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_xxhashes"

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      ShingleUtil.hashes(input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.ShingleUtil.hashes($a, $k));")

  override protected def withNewChildInternal(newChild: Expression): ShingleXxhashes =
    copy(child = newChild)
}
