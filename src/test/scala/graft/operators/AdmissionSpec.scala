package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-verdict coverage for the incremental admission screen
  * (q234/q235): one synthetic corpus where every verdict class fires
  * exactly once, assembled through the REAL probe implementations
  * (screen columns, exact-verified pairs, decontamination join), plus
  * the stream ≡ batch identity on the fixture corpus. */
class AdmissionSpec extends SparkSpec {

  import spark.implicits._

  // unique-vocabulary token block: 100 distinct tokens prefixed per doc
  // (q23 score = 1.0), so no two blocks share a shingle
  private def block(tag: String): String =
    (0 until 100).map(i => s"${tag}_w$i").mkString(" ")

  // doc_ids: arriving ≡ 3 (mod 11); 388 = lcm-solved arriving ∧ eval
  private val storeX = block("x") // stored text, later re-arrives
  private val storeZ = block("z") // stored text, a near-dup arrives
  private val evalW = block("w") // the eval doc (also arriving: 388)
  private val docs = Seq(
    (1L, "s", storeX), // store
    (2L, "s", storeZ), // store
    (14L, "a", ""), // arriving: empty_text
    (25L, "a", Seq.fill(50)("spam").mkString(" ")), // arriving: low_quality
    (36L, "a", storeX), // arriving: exact_duplicate (fp in store)
    (47L, "a", block("y")), // arriving: admitted (batch keeper of y)
    (58L, "a", block("y")), // arriving: batch_duplicate (same fp as 47)
    // near-dup of storeZ: one token changed out of 100 → J ≈ 0.9
    (69L, "a", block("z").replace("z_w50", "edited")),
    (388L, "a", evalW), // arriving: eval_reserved (388 % 97 = 0)
    // contains one 5-gram of the eval doc inside its own vocabulary →
    // contaminated but J vs W ≈ 0.03, far below the near-dup threshold
    (80L, "a", (block("c") + " " +
      (10 until 15).map(i => s"w_w$i").mkString(" "))),
    (91L, "a", block("k"))) // arriving: admitted
    .toDF("doc_id", "source", "text")

  // the planted corpus through the TVF body (table-derived probes):
  // exactly the wiring `incremental_admission()` resolves
  private lazy val verdicts: Map[Long, String] =
    Admission.tableVerdicts(spark, docs)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap

  test("every verdict class fires on its planted document") {
    assert(verdicts === Map(
      14L -> "empty_text", 25L -> "low_quality", 36L -> "exact_duplicate",
      47L -> "admitted", 58L -> "batch_duplicate", 69L -> "near_duplicate",
      388L -> "eval_reserved", 80L -> "contaminated", 91L -> "admitted"))
  }

  test("verdicts honor the first-failing-screen priority order") {
    // 36 is ALSO a near-dup of store doc 1 (it is an exact copy — J = 1),
    // so the exact screen must claim it before the near screen does
    assert(verdicts(36L) === "exact_duplicate")
    // 388 is clean of every earlier screen — eval routing is what fires
    assert(verdicts(388L) === "eval_reserved")
  }

  test("q234 admits exactly the documents passing every screen (fixture corpus)") {
    val out = Admission.q234IncrementalAdmission(spark, sf)
    val rows = out.collect()
    // one verdict per arriving document, verdicts from the closed set
    val arriving = graft.core.Tables.documents(spark, sf)
      .filter(Admission.isArriving).count()
    assert(rows.length.toLong === arriving)
    val allowed = Set("empty_text", "low_quality", "exact_duplicate",
      "batch_duplicate", "near_duplicate", "eval_reserved", "contaminated",
      "admitted")
    assert(rows.forall(r => allowed(r.getAs[String]("verdict"))))
    // no admitted doc is an eval doc or carries a sub-floor score
    val admitted = rows.filter(_.getAs[String]("verdict") == "admitted")
    assert(admitted.forall(r => r.getAs[Long]("doc_id") % Dedup.EvalDocModulus != 0))
    assert(admitted.forall(r =>
      r.getAs[Long]("q_micro") >= Curation.QualityFloorMicro))
  }

  test("the streaming screen's verdicts equal the batch screen's (q235 ≡ q234)") {
    val batch = Admission.q234IncrementalAdmission(spark, sf)
    val stream = graft.streaming.AdmissionStream.q235StreamAdmission(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "stream and batch admission verdicts diverged")
  }
}
