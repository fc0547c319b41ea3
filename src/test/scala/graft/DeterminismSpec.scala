package graft

/** Run-to-run determinism gate over the ENTIRE query surface: every
  * `SparkEntry.queries` entry executes twice and must produce the exact
  * same multiset of rows (bitwise — floats included).
  *
  * This is the property the oracle gate cannot see: a query can
  * hash-match DuckDB on one run and still be partition-order
  * nondeterministic (an unrounded double sum, an unstable tie-break, a
  * time- or random-seeded expression) — exactly the class of bug that
  * surfaces as a phantom mismatch at a different SF or parallelism.
  * Every operator here is CONTRACTED deterministic: integer-exact
  * aggregation, seeded/fixed hash planes, total-order sorts; this spec
  * enforces the contract generically for every present and future query.
  *
  * Rows are compared as sorted multisets, not sequences: presentation
  * order for tied sort keys is legitimately unstable; VALUES are not.
  */
class DeterminismSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      def canon(): Seq[String] =
        fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val a = canon()
      val b = canon()
      assert(a == b, s"$name produced different results on identical runs")
      assert(a.nonEmpty || b.isEmpty) // touch both to keep them live
    }
  }
}
