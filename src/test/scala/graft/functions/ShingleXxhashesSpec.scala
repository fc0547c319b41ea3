package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-equality gate for the native shingle-hash expression against the
  * composable chain it replaced — the contract that lets the whole
  * dedup family (sigsOf consumers: MinHash-LSH, exact Jaccard, band
  * buckets, decontamination membership) swap implementations without
  * any oracle or pair set moving. */
class ShingleXxhashesSpec extends SparkSpec {

  private def chain(text: org.apache.spark.sql.Column) =
    transform(graft.operators.Dedup.shingleArray(text), s => xxhash64(s))

  test("native expression == composable chain on the whole corpus") {
    val docs = graft.core.Tables.documents(spark, sf)
    val bad = docs.select(
        VectorFunctions.shingle_xxhashes(col("text")).as("a"),
        chain(col("text")).as("b"))
      .filter(not(col("a") === col("b")))
      .count()
    assert(bad == 0, s"$bad documents hash differently")
  }

  test("edge cases: empty, blanks, short, multi-space, non-ASCII, duplicates") {
    import spark.implicits._
    val cases = Seq(
      "",                                   // no tokens -> one '' shingle
      "   ",                                // only spaces -> same
      "one",                                // < k tokens -> one short shingle
      "a b c d",                            // exactly k-1
      "a b c d e",                          // exactly k -> one window
      "a  b   c d e f",                     // runs of spaces collapse
      "x y x y x y x y x y x y",            // repeated shingles -> distinct
      "héllo wörld ünïcode tökens ça va bien", // multi-byte UTF-8
      (1 to 200).map(i => s"w${i % 7}").mkString(" ")) // heavy dup tail
      .toDF("text")
    val bad = cases.select(
        VectorFunctions.shingle_xxhashes(col("text")).as("a"),
        chain(col("text")).as("b"))
      .filter(not(col("a") === col("b")))
      .count()
    assert(bad == 0)
    // and the degenerate empty-text value is the hash of ''
    val empty = cases.filter(col("text") === "")
      .select(VectorFunctions.shingle_xxhashes(col("text")))
      .collect()(0).getSeq[Long](0)
    val emptyHash = cases.limit(1).select(xxhash64(lit(""))).collect()(0).getLong(0)
    assert(empty == Seq(emptyHash))
  }

  test("null text follows the composable chain: the one-empty-shingle signature") {
    // the chain's concat_ws swallows the null slice, so NULL text maps
    // to [''] -> [xxhash64('')] — the Column wrapper's coalesce
    // reproduces that, keeping sigsOf's behavior unchanged on
    // nullable streaming schemas
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("doc_id", "text")
    val viaNew = df.select(VectorFunctions.shingle_xxhashes(col("text"))).collect()(0)
    val viaOld = df.select(chain(col("text"))).collect()(0)
    assert(!viaNew.isNullAt(0) && !viaOld.isNullAt(0))
    assert(viaNew.getSeq[Long](0) == viaOld.getSeq[Long](0))
  }

  test("the expression participates in whole-stage codegen") {
    val df = graft.core.Tables.documents(spark, sf)
      .select(VectorFunctions.shingle_xxhashes(col("text")).as("hs"))
    df.collect()
    // `*(n)` is the WholeStageCodegen marker in the executed plan's
    // simple string; the project carrying the expression must have one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("shingle_xxhashes") && l.contains("*(")),
      s"shingle projection not inside a codegen span:\n$plan")
  }
}
