package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Drift gate for `ADVICE.md` (round-9 verdict item 2: the file went
  * stale two rounds running — items stayed listed after their defects
  * were fixed). The register's contract:
  *
  *   - every bullet under `## Open` is `- **sev** path:line — summary`
  *     with an indented `anchor:` regex line;
  *   - the cited line of the cited file still MATCHES the anchor (so
  *     the moment a fix lands, the anchor stops matching and this spec
  *     forces the register to be updated in the same commit);
  *   - the `Open items: N` count equals the number of open bullets.
  *
  * A register with zero open items passes trivially on the anchor
  * check but still enforces the count line — the state the tree should
  * normally be in. */
class AdviceRegisterSpec extends AnyFunSuite {

  private lazy val lines: Vector[String] = {
    val p = Paths.get("ADVICE.md")
    assert(Files.exists(p), "ADVICE.md missing")
    Files.readAllLines(p).asScala.toVector
  }

  private lazy val openSection: Vector[String] = {
    val start = lines.indexWhere(_.trim == "## Open")
    assert(start >= 0, "ADVICE.md has no '## Open' section")
    val rest = lines.drop(start + 1)
    val end = rest.indexWhere(_.trim.startsWith("## "))
    if (end < 0) rest else rest.take(end)
  }

  private val Bullet = """- \*\*\w+\*\* ([\w./-]+):(\d+) — .+""".r
  private val Anchor = """\s+anchor: (.+)""".r

  private lazy val items: Seq[(String, Int, String)] = {
    val bullets = openSection.zipWithIndex.collect {
      case (Bullet(path, line, _*), i) => (path, line.toInt, i)
    }
    bullets.map { case (path, line, i) =>
      val anchor = openSection.drop(i + 1).collectFirst {
        case Anchor(re) => re.trim
      }
      assert(anchor.nonEmpty, s"open item $path:$line has no anchor: line")
      (path, line, anchor.get)
    }
  }

  test("open-item count line matches the number of open bullets") {
    val declared = lines.collectFirst {
      case l if l.startsWith("Open items:") => l.stripPrefix("Open items:").trim.toInt
    }
    assert(declared.nonEmpty, "ADVICE.md has no 'Open items: N' count line")
    assert(declared.get == items.size,
      s"ADVICE.md declares ${declared.get} open items but lists ${items.size}")
  }

  test("every open item's anchor still matches its cited line") {
    items.foreach { case (path, lineNo, anchorRe) =>
      val p = Paths.get(path)
      assert(Files.exists(p), s"ADVICE.md cites missing file $path")
      val src = Files.readAllLines(p).asScala
      assert(lineNo >= 1 && lineNo <= src.size,
        s"ADVICE.md cites $path:$lineNo but the file has ${src.size} lines")
      val cited = src(lineNo - 1)
      assert(anchorRe.r.findFirstIn(cited).nonEmpty,
        s"ADVICE.md item $path:$lineNo drifted — line no longer matches " +
          s"anchor /$anchorRe/: '$cited'. Fix or close the item in the same commit.")
    }
  }
}
