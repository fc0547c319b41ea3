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
