package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over float-vector
  * columns (SURVEY §2.9 similarity search).
  *
  * Why a custom expression: the composable form
  * (`aggregate(zip_with(a, b, multiply), ...)`) allocates an intermediate
  * array and walks it with interpreted lambda calls per element — measured
  * 42 s for the 4M-pair near-dup scan at sf0.1. This expression generates
  * a tight primitive loop inside whole-stage codegen (no allocation, no
  * virtual calls), the same shape a C++ engine would emit.
  *
  * Numeric contract (oracle parity): every accumulation is a
  * left-to-right double fold — dot = Σ aᵢ·bᵢ, na = Σ aᵢ², nb = Σ bᵢ²,
  * result = dot / sqrt(na·nb) — exactly the formula and order the DuckDB
  * oracle computes over DOUBLE[] casts, so results are bit-identical to
  * the interpreted form it replaces.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** SimHash signature from a row-local array of 64-bit token hashes
  * (SURVEY §2.9). Counterpart of [[SimhashAgg]] for the common case where
  * a document's shingles are already materialized in its own row: per-bit
  * majority vote in one codegen'd loop — no explode, no shuffle, no
  * aggregation. At 100 TB this is the difference between a map-only stage
  * and shuffling |docs|×|shingles| rows. */
case class Simhash64(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) { counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      s"""
         |final int[] $counts = new int[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  final long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $counts[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** All-permutations MinHash signature in ONE traversal of the hashed
  * shingle array (SURVEY §2.9 MinHash+LSH). Replaces the composable form
  * — one `array_min(transform(hs, xorshift(seed_i, _)))` per permutation —
  * which re-walks the array once per permutation (24× the work, measured
  * as the single largest bench cost at sf0.1). Here the element loop is
  * outer and the permutation loop inner, so each hash is loaded once and
  * all 24 running minima update in registers.
  *
  * The per-permutation mixer is EXACTLY the composable form's math —
  * x = h ^ seed_i, then a 13/7/17 xorshift64 round — so signatures (and
  * therefore LSH bands, candidates, and the exact-verified q27 output)
  * are bit-identical to the expression it replaces. Seeds are derived
  * driver-side (plain JVM arithmetic; ANSI-mode overflow rules apply only
  * to SQL expressions, which is why the composable form had to avoid
  * multiplies but this constant table does not need to).
  *
  * Empty input yields Long.MaxValue minima (the shingle pipeline never
  * produces an empty array — `shingleArray` emits ≥1 shingle — but the
  * expression stays total for direct SQL use). */
case class MinhashSigs(child: Expression, numPerm: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(numPerm > 0, "numPerm must be positive")

  private lazy val seeds: Array[Long] =
    Array.tabulate(numPerm)(i => 0x9E3779B97F4A7C15L ^ (0x2545F4914F6CDD1DL * (i + 1)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numPerm) {
        var x = h ^ seeds(i)
        x ^= x << 13
        x ^= x >>> 7
        x ^= x << 17
        if (x < mins(i)) mins(i) = x
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val mins = ctx.freshName("mins")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  final long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $numPerm; $i++) {
         |    long $x = $h ^ $seedsRef[$i];
         |    $x ^= $x << 13;
         |    $x ^= $x >>> 7;
         |    $x ^= $x << 17;
         |    if ($x < $mins[$i]) $mins[$i] = $x;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** Indices of the `m` nearest centroids (squared-L2, nearest first) for a
  * float-vector column — the IVF assignment step (SURVEY §2.9 similarity
  * search) as a map-only codegen'd expression. `m = 1` is classic IVF;
  * `m = 2` is spill-to-2nd-nearest (each vector indexed in its two
  * nearest lists), the standard recall lever for boundary vectors. The
  * centroid table is a plan constant (built once per corpus by
  * [[graft.operators.IvfIndex]] and shipped to executors via the codegen
  * reference array), so assignment is embarrassingly parallel: no
  * ML-library transform, no join, no shuffle — the shape that scales to
  * 100 TB as a pure scan stage. The m-selection is a tight
  * insertion-into-sorted-m loop (m is 1-4 in practice; no heap needed). */
case class NearestCentroids(child: Expression, centers: Array[Array[Double]], m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centers.nonEmpty, "centers must be non-empty")
  require(m > 0 && m <= centers.length, "m must be in [1, centers.length]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val bestIdx = new Array[Int](m)
    val bestD = Array.fill(m)(Double.MaxValue)
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(v.numElements(), ctr.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - ctr(i)
        d += diff * diff
        i += 1
      }
      // insert (c, d) into the sorted top-m arrays
      var slot = m - 1
      if (d < bestD(slot)) {
        while (slot > 0 && d < bestD(slot - 1)) {
          bestD(slot) = bestD(slot - 1); bestIdx(slot) = bestIdx(slot - 1); slot -= 1
        }
        bestD(slot) = d; bestIdx(slot) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centersRef = ctx.addReferenceObj("ivfCenters", centers, "double[][]")
      val bestIdx = ctx.freshName("bestIdx")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      val slot = ctx.freshName("slot")
      s"""
         |final int[] $bestIdx = new int[$m];
         |final double[] $bestD = new double[$m];
         |java.util.Arrays.fill($bestD, Double.MAX_VALUE);
         |for (int $c = 0; $c < $centersRef.length; $c++) {
         |  final double[] $ctr = $centersRef[$c];
         |  final int $n = java.lang.Math.min($a.numElements(), $ctr.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $diff = (double) $a.getFloat($i) - $ctr[$i];
         |    $d += $diff * $diff;
         |  }
         |  int $slot = $m - 1;
         |  if ($d < $bestD[$slot]) {
         |    while ($slot > 0 && $d < $bestD[$slot - 1]) {
         |      $bestD[$slot] = $bestD[$slot - 1]; $bestIdx[$slot] = $bestIdx[$slot - 1]; $slot--;
         |    }
         |    $bestD[$slot] = $d; $bestIdx[$slot] = $c;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($bestIdx);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** All sign-LSH table buckets for a float vector in ONE pass over the
  * plane set (SURVEY §2.9 similarity search). The composable form — one
  * interpreted `aggregate(zip_with(...))` dot fold per plane — evaluates
  * T·k higher-order lambdas per row (96 for the near-dup scale path);
  * this expression runs the same left-fold dot products as a tight
  * native loop and packs each table's k sign bits into its bucket id.
  * Same accumulation order as the composable `dot`, so sign decisions
  * (and therefore buckets) are bit-identical. */
case class SignBuckets(
    child: Expression,
    planes: Array[Array[Double]],
    planesPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planesPerTable > 0 && planes.nonEmpty && planes.length % planesPerTable == 0,
    "planes must divide evenly into tables")

  private def numTables: Int = planes.length / planesPerTable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](numTables)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += v.getFloat(i).toDouble * plane(i); i += 1 }
      if (d > 0.0) out(p / planesPerTable) |= 1 << (p % planesPerTable)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val out = ctx.freshName("out")
      val plane = ctx.freshName("plane")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |final int[] $out = new int[$numTables];
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  final double[] $plane = $planesRef[$p];
         |  final int $n = java.lang.Math.min($a.numElements(), $plane.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += (double) $a.getFloat($i) * $plane[$i];
         |  }
         |  if ($d > 0.0) $out[$p / $planesPerTable] |= 1 << ($p % $planesPerTable);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}

/** Double dot product over two array<bigint> columns as ONE codegen'd
  * fold — the quantized-integer building block the embedding-analytics
  * family (q157/q192/q195) scores with. Deliberately NOT a packaged
  * cosine: the callers' oracles fix the exact double grouping
  * `(1e6·dot)/sqrt(dotA·dotB)`, so the composition stays at the call
  * site and only the fold is compiled. Numeric contract: left-to-right
  * double accumulation of xᵢ·yᵢ — bit-identical to the interpreted
  * `aggregate(zip_with(a, b, *), 0.0, +)` chain it replaces (which the
  * oracles replay as `list_dot_product` over CAST(... AS DOUBLE)). */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getLong(i).toDouble * y.getLong(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getLong($i) * (double) $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Unit-normalize-and-quantize in ONE codegen'd pass: for a float
  * vector v, emit `halfAway(quant · vᵢ / ‖v‖)` per element as
  * array<bigint> (sign-split half-away-from-zero, the
  * [[graft.operators.KMeans]] cross-engine rounding contract).
  *
  * Why a custom expression: the composable form —
  * `transform(v, x -> halfAway(q·x / sqrt(aggregate(zip_with(v,v,*)))))`
  * — re-evaluates the norm fold PER ELEMENT (Catalyst does no
  * common-subexpression elimination inside lambda bodies), i.e. O(dim²)
  * interpreted work with an allocation per zip; measured 2.3 s for 2k
  * vectors at sf0.1 (q192) and 17.7 s at the 10× tree. This computes
  * the norm once and quantizes in a tight loop. Numeric contract
  * unchanged: norm = left-fold Σ x², per-element double divide, the
  * same half-away branch — bit-identical to the chain it replaces. */
case class UnitQuantize(child: Expression, quant: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unit_quantize"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val y = quant * v.getFloat(i).toDouble / nrm
      out(i) =
        if (y >= 0) math.floor(y + 0.5).toLong else -math.floor(-y + 0.5).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $v.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $v.getFloat($i);
         |  $ss += $x * $x;
         |}
         |final double $nrm = java.lang.Math.sqrt($ss);
         |final long[] $out = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  final double $y = $quant * (double) $v.getFloat($j) / $nrm;
         |  $out[$j] = ($y >= 0)
         |    ? (long) java.lang.Math.floor($y + 0.5)
         |    : -(long) java.lang.Math.floor(-$y + 0.5);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitQuantize =
    copy(child = newChild)
}

object VectorFunctions {

  /** Column-level entry point: `cosine_sim(a, b)` as a codegen'd native
    * expression. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `dot_long(a, b)` — one-fold double dot product over bigint
    * arrays (composition with 1e6·/sqrt stays at the call site so the
    * oracles' exact double grouping is preserved). */
  def dot_long(a: Column, b: Column): Column =
    GraftBridge.column(DotProductLong(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `unit_quantize(v, q)` — unit-normalize + half-away integer
    * quantization in one codegen'd pass. */
  def unit_quantize(v: Column, quant: Double): Column =
    GraftBridge.column(UnitQuantize(GraftBridge.expression(v), quant))

  /** `simhash64(hashArray)` — row-local SimHash signature. */
  def simhash64(hashes: Column): Column =
    GraftBridge.column(Simhash64(GraftBridge.expression(hashes)))

  /** `minhash_sigs(hashArray, n)` — all n permutation minima in one
    * pass; returns array<bigint> of length n. */
  def minhash_sigs(hashes: Column, numPerm: Int): Column =
    GraftBridge.column(MinhashSigs(GraftBridge.expression(hashes), numPerm))

  /** `nearest_centroid(vec)` against a constant centroid table — IVF
    * assignment as a map-only scan. */
  def nearest_centroids(vec: Column, centers: Array[Array[Double]], m: Int): Column =
    GraftBridge.column(NearestCentroids(GraftBridge.expression(vec), centers, m))

  /** `rolling_hash(text)` — polynomial fingerprint of the UTF-8 bytes
    * (codegen'd single byte loop). */
  def rolling_hash(text: Column): Column =
    GraftBridge.column(RollingHash64(GraftBridge.expression(text)))

  /** `deflate_ratio(text)` — compressed/original byte ratio (quality
    * signal; repetitive text ≪ natural prose). */
  def deflate_ratio(text: Column): Column =
    GraftBridge.column(DeflateRatio(GraftBridge.expression(text)))

  /** `shingle_xxhashes(text, k)` — distinct k-word shingle xxhash64
    * signature in one codegen'd byte loop (the dedup family's hot
    * inner stage; bit-identical to the composable
    * `transform(shingleArray(text), xxhash64)` chain, spec-gated). */
  def shingle_xxhashes(text: Column, k: Int = 5): Column =
    // coalesce matches the composable chain's null semantics: its
    // concat_ws swallows the null slice, so a NULL document yields the
    // one-empty-shingle signature [xxhash64('')], not NULL
    GraftBridge.column(ShingleXxhashes(
      GraftBridge.expression(org.apache.spark.sql.functions.coalesce(
        text, org.apache.spark.sql.functions.lit(""))), k))

  /** `sign_buckets(vec)` against a constant plane set — all LSH table
    * buckets in one traversal; returns array<int> of length
    * planes.length / planesPerTable. */
  def sign_buckets(vec: Column, planes: Array[Array[Double]], planesPerTable: Int): Column =
    GraftBridge.column(SignBuckets(GraftBridge.expression(vec), planes, planesPerTable))

  /** `sorted_set_count(hashArray)` — exact membership count against a
    * sorted broadcast long set (binary search per element; the map-only
    * probe for at-ingest screens). */
  def sorted_set_count(hashes: Column,
      sortedSetBc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    GraftBridge.column(SortedLongSetCount(GraftBridge.expression(hashes), sortedSetBc))

  /** `sorted_weight_sum(hashArray)` — Σ of the aligned weights for each
    * element found in the sorted broadcast key array (binary search per
    * element; the map-only linear-model scorer for at-ingest screens). */
  def sorted_weight_sum(hashes: Column,
      keysBc: org.apache.spark.broadcast.Broadcast[Array[Long]],
      weightsBc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    GraftBridge.column(SortedKeyWeightSum(
      GraftBridge.expression(hashes), keysBc, weightsBc))
}
