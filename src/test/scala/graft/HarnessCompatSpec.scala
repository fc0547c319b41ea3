package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** DRIVER-HARNESS compatibility gate over every oracle-gated query.
  *
  * The driver's correctness gate reads both result sets through pandas
  * and hash-compares stringified cells. Two type families survive a
  * values-equal comparison in DuckDB yet hash-FAIL there (both cost
  * queries in round 8):
  *
  *   - a DuckDB `sum(BIGINT)` left uncast is decimal128(38,0); pandas
  *     renders it `3.0` against Spark's int64 `3` (q152/q164/q166);
  *   - a top-level array/map/struct Spark column makes pandas
  *     `sort_values` throw `unhashable type: 'numpy.ndarray'` (q141).
  *
  * DuckDB cannot run inside the JVM, so the oracle-side types are
  * checked against `tools/oracle_types.json` — the type manifest that
  * `tools/check_oracle.py` (the local stand-in for the driver gate)
  * rewrites on every run. The workflow already regenerates it before
  * each commit (same discipline as the OperatorCatalog), so this spec
  * turns both failure modes into test-suite failures:
  *
  *   1. every `SparkEntry.oracleSql` key must be present in the
  *      manifest (a new query without a local gate run fails here);
  *   2. no Spark output column may be nested (list/struct/map);
  *   3. no oracle column may be decimal/hugeint (uncast sum);
  *   4. same-named columns must agree on int-vs-float family.
  */
class HarnessCompatSpec extends AnyFunSuite {

  private val manifestFile = new java.io.File("tools/oracle_types.json")

  private lazy val manifest: Map[String, Map[String, Map[String, String]]] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(manifestFile)
    import scala.jdk.CollectionConverters._
    root.properties().asScala.map { e =>
      val sides = e.getValue.properties().asScala.map { s =>
        s.getKey -> s.getValue.properties().asScala
          .map(c => c.getKey -> c.getValue.asText()).toMap
      }.toMap
      e.getKey -> sides
    }.toMap
  }

  private def family(t: String): String =
    if (t.startsWith("int") || t.startsWith("uint")) "int"
    else if (t == "float" || t == "double" || t == "halffloat") "float"
    else t

  test("the oracle type manifest exists and covers every oracle-gated query") {
    assert(manifestFile.exists(),
      "tools/oracle_types.json missing — run tools/check_oracle.py to regenerate")
    val missing = SparkEntry.oracleSql.keySet -- manifest.keySet
    assert(missing.isEmpty,
      s"queries with no manifest entry (regen via check_oracle.py): ${missing.toSeq.sorted}")
  }

  SparkEntry.oracleSql.keys.toSeq.sorted.foreach { name =>
    test(s"$name result types survive the driver's pandas layer") {
      val entry = manifest.getOrElse(name,
        fail(s"$name absent from tools/oracle_types.json — regenerate"))
      val spark = entry("spark")
      val oracle = entry("oracle")
      val nested = spark.filter { case (_, t) =>
        t.startsWith("list") || t.startsWith("struct") ||
          t.startsWith("map") || t.startsWith("large_list")
      }
      assert(nested.isEmpty,
        s"nested Spark columns break pandas sort_values: $nested")
      val dec = oracle.filter { case (_, t) =>
        t.startsWith("decimal") || t == "int128" || t == "uint64"
      }
      assert(dec.isEmpty,
        s"decimal/hugeint oracle columns (uncast sum?) hash-fail in the driver: $dec — CAST(... AS BIGINT)")
      val mism = spark.keySet.intersect(oracle.keySet).filter(c =>
        family(spark(c)) != family(oracle(c)))
      assert(mism.isEmpty, s"int-vs-float family mismatch on: " +
        mism.toSeq.sorted.map(c => s"$c (spark=${spark(c)}, oracle=${oracle(c)})").mkString(", "))
    }
  }
}
