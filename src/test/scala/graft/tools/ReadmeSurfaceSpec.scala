package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Drift gate for README.md's surface counts (round-11 verdict item
  * 8): the query count and the SQL-TVF count are stated in the README
  * and must equal the live registries — the same discipline as
  * `OperatorCatalogSpec` (OPERATORS.md) and `AdviceRegisterSpec`
  * (ADVICE.md), so the README can never silently stale. The test
  * count deliberately carries no hardcoded number in the README (it is
  * partly dynamic registration, unknowable at spec time); the other
  * counts are derivable, so they are gated. */
class ReadmeSurfaceSpec extends AnyFunSuite {

  private lazy val readme: String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")))

  test("README query count equals SparkEntry.queries.size") {
    val stated = """ALL (\d+) queries are oracle""".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(stated.nonEmpty, "README lost its 'ALL N queries are oracle' line")
    assert(stated.contains(graft.SparkEntry.queries.size),
      s"README claims ${stated.get} queries; SparkEntry has " +
        s"${graft.SparkEntry.queries.size} — update README.md")
  }

  test("README TVF count equals the TableFunctions registry") {
    val stated = """TableFunctions \((\d+) SQL TVFs\)""".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(stated.nonEmpty, "README lost its 'TableFunctions (N SQL TVFs)' line")
    assert(stated.contains(graft.functions.TableFunctions.builders.size),
      s"README claims ${stated.get} TVFs; the registry has " +
        s"${graft.functions.TableFunctions.builders.size} — update README.md")
  }

  test("README carries no hardcoded test-suite count (dynamic registration)") {
    assert(!"""\d+\+? ScalaTest""".r.findFirstIn(readme).isDefined,
      "README hardcodes a ScalaTest count — it stales silently; keep it numeric-free")
  }
}
