package graft

import org.scalatest.funsuite.AnyFunSuite

/** The interactive prompt surface (reference Bootstrap.java:95-180) driven
  * by scripted input — no Spark session needed. */
class CliSpec extends AnyFunSuite {

  private def scripted(lines: String*): () => String = {
    val it = lines.iterator
    () => if (it.hasNext) it.next() else ""
  }

  test("promptInt: empty input falls back to the default (reference :98-100)") {
    assert(Cli.promptInt(scripted(""), "days?", 7) === 7)
    assert(Cli.promptInt(scripted("  "), "days?", 7) === 7)
    assert(Cli.promptInt(scripted("30"), "days?", 7) === 30)
  }

  test("select: empty input picks the first item (reference default-to-first :167-170)") {
    val items = Seq("big_rule" -> 100L, "small_rule" -> 3L)
    assert(Cli.select(items, scripted("")) === Some("big_rule"))
  }

  test("select: numeric input picks by index, out-of-range yields None (:172-180)") {
    val items = Seq("a" -> 10L, "b" -> 5L, "c" -> 1L)
    assert(Cli.select(items, scripted("2")) === Some("c"))
    assert(Cli.select(items, scripted("0")) === Some("a"))
    assert(Cli.select(items, scripted("9")) === None)
  }

  test("select prints the reference's menu layout (star on first row)") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.select(Seq("r1" -> 42L, "r2" -> 7L), scripted(""))
    }
    val text = out.toString
    assert(text.contains("* [0]: r1  || doc count:42"), text)
    assert(text.contains("  [1]: r2  || doc count:7"), text)
  }
}
