package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Drift gate for the committed per-query bench record (round-13
  * verdict item 5): `BENCH_r*.json` keeps only the slowest-10 in its
  * parseable tail, so round-over-round per-query regression analysis
  * depends on `BENCH_LAST.json` (the full per-query map) being
  * COMMITTED and COVERING the whole surface. This spec fails when a
  * query exists that the committed record has never timed — the same
  * posture as `OperatorCatalogSpec` for OPERATORS.md: adding a query
  * obligates refreshing the artifact (run `graft.Bench` at sf0.1 and
  * commit the updated file). */
class BenchArtifactSpec extends SparkSpec {

  test("BENCH_LAST.json is committed and covers every query") {
    val p = Paths.get("BENCH_LAST.json")
    assert(Files.exists(p),
      "BENCH_LAST.json missing — run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 " +
        "sbt \"runMain graft.Bench\" and commit it")
    val content = Files.readString(p)
    assert(content.contains("\"metric\":\"total\""), "not a bench record")
    val missing = graft.SparkEntry.queries.keys
      .filterNot(n => content.contains("\"" + n + "\":")).toSeq.sorted
    assert(missing.isEmpty,
      s"BENCH_LAST.json is stale — never timed: ${missing.mkString(", ")}; " +
        "re-run graft.Bench at sf0.1 and commit the refreshed file")
  }
}
