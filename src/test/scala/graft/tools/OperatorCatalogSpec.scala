package graft.tools

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** CI drift gate for the generated operator catalog: regenerate and
  * compare byte-for-byte, so OPERATORS.md can never describe a query
  * surface other than the one SparkEntry actually exports. */
class OperatorCatalogSpec extends AnyFunSuite {

  test("OPERATORS.md matches the generated catalog") {
    val committed = Paths.get("OPERATORS.md")
    assert(Files.exists(committed),
      "OPERATORS.md missing — run: sbt \"runMain graft.tools.OperatorCatalog\"")
    val onDisk = Files.readString(committed)
    val generated = OperatorCatalog.generate()
    assert(onDisk == generated,
      "OPERATORS.md is stale — regenerate with: sbt \"runMain graft.tools.OperatorCatalog\"")
  }
}
