package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install the dialect on a fresh session (withExtensions)") {
    // The spark.sql.extensions CONFIG path only applies when the
    // SparkContext itself is created with it (Spark reads it from the
    // context conf) — unreachable in a shared test JVM. withExtensions
    // drives the exact same injectFunction mechanism, so that is what
    // this spec exercises; a fresh SparkSession is still required, hence
    // the default/active clearing (never stop the shared SparkContext).
    val previous = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val one = spark.sql("SELECT strpos('a@b', '@') AS p").head().getInt(0)
      assert(one == 2)
      val agg = spark.sql(
        "SELECT string_agg(x, '|') AS s FROM VALUES ('b'), ('a'), ('c') t(x)")
        .head().getString(0)
      assert(agg == "a|b|c") // deterministic value-ordered
      val cos = spark.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val sh = spark.sql(
        "SELECT simhash_agg(xxhash64(x)) AS s FROM VALUES ('b'), ('a') t(x)")
        .head().getLong(0)
      assert(sh != 0L)
      // row-local forms agree with their composable/grouped siblings
      val sh64 = spark.sql(
        "SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS s").head().getLong(0)
      assert(sh64 == sh) // same token set -> same signature
      val mins = spark.sql(
        "SELECT minhash_sigs(array(xxhash64('a'), xxhash64('b')), 4) AS m")
        .head().getSeq[Long](0)
      assert(mins.length == 4 && mins.distinct.length > 1)
    } finally {
      // restore the shared session for the other suites; never stop the
      // SparkContext here — it is JVM-wide.
      SparkSession.clearActiveSession()
      previous.foreach(SparkSession.setDefaultSession)
    }
  }
}
