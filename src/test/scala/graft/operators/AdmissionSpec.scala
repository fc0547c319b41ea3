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

  /** Replace tokens [from, from+15) of a 100-token block with unique
    * `tag`-prefixed tokens: 15 changed tokens kill the 19 5-shingles
    * whose window touches them, so one edit window gives
    * J = 77/115 ≈ 0.67 (≥ 0.6) and two disjoint windows give
    * J = 58/134 ≈ 0.43 (< 0.6) — the arithmetic the re-election trio
    * below is built on. */
  private def edit(text: String, from: Int, tag: String): String = {
    val w = text.split(" ")
    (0 until 15).foreach(i => w(from + i) = s"${tag}_e$i")
    w.mkString(" ")
  }

  // doc_ids: arriving ≡ 3 (mod 11); 388 = lcm-solved arriving ∧ eval
  private val storeX = block("x") // stored text, later re-arrives
  private val storeZ = block("z") // stored text, a near-dup arrives
  private val storeQ = block("q") // stored text anchoring the re-election trio
  private val evalW = block("w") // the eval doc (also arriving: 388)
  private val docs = Seq(
    (1L, "s", storeX), // store
    (2L, "s", storeZ), // store
    (4L, "s", storeQ), // store
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
    (91L, "a", block("k")), // arriving: admitted
    // within-batch near-dup pair with NO store counterpart: the min
    // member keeps, the other is screened at the door
    (102L, "a", block("b")), // arriving: admitted (batch group keeper)
    (113L, "a", block("b").replace("b_w50", "altered")), // batch_near_duplicate
    // RE-ELECTION trio: 135 near-dups the STORE doc 4 (one edit window,
    // J ≈ 0.67) so screen 5 rejects it; 146 = 135 plus a second edit
    // window — J(146, 135) ≈ 0.67 (same batch group) but
    // J(146, store) ≈ 0.43 (< 0.6, no store hit). The group's naive
    // minimum (135) is dead, so the keeper is re-elected among
    // survivors and 146 is ADMITTED — without re-election the group
    // would lose all its content at the door
    (135L, "a", edit(storeQ, 40, "r1")),
    (146L, "a", edit(edit(storeQ, 40, "r1"), 60, "r2")))
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
      388L -> "eval_reserved", 80L -> "contaminated", 91L -> "admitted",
      102L -> "admitted", 113L -> "batch_near_duplicate",
      135L -> "near_duplicate", 146L -> "admitted"))
  }

  test("verdicts honor the first-failing-screen priority order") {
    // 36 is ALSO a near-dup of store doc 1 (it is an exact copy — J = 1),
    // so the exact screen must claim it before the near screen does
    assert(verdicts(36L) === "exact_duplicate")
    // 388 is clean of every earlier screen — eval routing is what fires
    assert(verdicts(388L) === "eval_reserved")
  }

  test("within-batch near-dup groups admit exactly one survivor") {
    // the {102, 113} pair has no store counterpart: min member admitted,
    // the other rejected at the door (previously both were admitted and
    // left to the next periodic sweep)
    assert(verdicts(102L) === "admitted")
    assert(verdicts(113L) === "batch_near_duplicate")
  }

  test("the batch keeper is re-elected among screen-1-5 survivors") {
    // group {135, 146}: the naive minimum 135 is a STORE near-dup
    // (screen 5), so the survivor 146 must keep — flagging 146 as
    // batch_near_duplicate of a dead keeper would lose the content
    assert(verdicts(135L) === "near_duplicate")
    assert(verdicts(146L) === "admitted")
  }

  test("q234 admits exactly the documents passing every screen (fixture corpus)") {
    val out = Admission.q234IncrementalAdmission(spark, sf)
    val rows = out.collect()
    // one verdict per arriving document, verdicts from the closed set
    val arriving = graft.core.Tables.documents(spark, sf)
      .filter(Admission.isArriving).count()
    assert(rows.length.toLong === arriving)
    val allowed = Set("empty_text", "low_quality", "exact_duplicate",
      "batch_duplicate", "near_duplicate", "batch_near_duplicate",
      "eval_reserved", "contaminated", "admitted")
    assert(rows.forall(r => allowed(r.getAs[String]("verdict"))))
    // no admitted doc is an eval doc or carries a sub-floor score
    val admitted = rows.filter(_.getAs[String]("verdict") == "admitted")
    assert(admitted.forall(r => r.getAs[Long]("doc_id") % Dedup.EvalDocModulus != 0))
    assert(admitted.forall(r =>
      r.getAs[Long]("q_micro") >= Curation.QualityFloorMicro))
    // near-dup-free BY CONSTRUCTION: no verified pair survives with both
    // endpoints admitted — neither against the store nor within the batch
    val admittedIds = admitted.map(_.getAs[Long]("doc_id")).toSet
    val survivingPairs = Dedup.q27MinhashLsh(spark, sf)
      .collect()
      .count(r => admittedIds(r.getLong(0)) && admittedIds(r.getLong(1)))
    assert(survivingPairs === 0,
      s"$survivingPairs verified near-dup pairs fully admitted")
  }

  test("the streaming screen's verdicts equal the batch screen's (q235 ≡ q234)") {
    val batch = Admission.q234IncrementalAdmission(spark, sf)
    val stream = graft.streaming.AdmissionStream.q235StreamAdmission(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "stream and batch admission verdicts diverged")
  }
}
