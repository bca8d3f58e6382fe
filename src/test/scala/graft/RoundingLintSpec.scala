package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source lint for the BASELINE.md display-rounding rule, enforced
  * mechanically (the r11 discipline): no main-source code path may call an
  * engine's `round(...)` — Spark's `functions.round` / SQL `round(` round
  * the shortest-DECIMAL representation while DuckDB rounds the BINARY
  * value, so the two can disagree within an ulp of every display boundary
  * (the observed q62 1-row mismatch at sf1). Every quantization must go
  * through the shared half-up floor forms ([[graft.operators.Det]]:
  * `scaled`/`quant`/`display` and their SQL twins) or spell the same
  * `floor(x * 10^s + 0.5)` op sequence inline on both engine sides.
  *
  * The lint scans every `.scala` file under src/main/scala — operator
  * code, oracle SQL strings, expr() fragments, and imperative kernels all
  * live there — and fails on any non-comment occurrence of `round(`
  * (including `math.round(`). Tests are out of scope: driver recomputes
  * that READ near-integer fixture values with `math.round` are legitimate.
  * No allowlist on purpose: a new site that genuinely needs engine
  * rounding must instead extend Det with a cross-engine-deterministic
  * form and its rationale.
  */
class RoundingLintSpec extends AnyFunSuite {

  private val MainRoot = java.nio.file.Paths.get("src/main/scala")

  // `round(` not preceded by a letter: catches `round(`, `math.round(`,
  // `functions.round(` but not identifiers merely ending in "round".
  private val RoundCall = "(?<![A-Za-z])round\\(".r

  private def stripComments(line: String): String = {
    val t = line.trim
    // scaladoc/block-comment body lines and pure line comments
    if (t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")) ""
    // trailing line comment (no block-comment edge cases in this codebase's
    // style; a false negative here would still be caught on the code side)
    else line.indexOf("//") match {
      case -1 => line
      case i  => line.substring(0, i)
    }
  }

  test("no engine round( call survives in main source (Det floor forms only)") {
    import scala.jdk.CollectionConverters._
    val offenders = java.nio.file.Files.walk(MainRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        scala.io.Source.fromFile(p.toFile, "UTF-8").getLines().zipWithIndex.collect {
          case (line, i) if RoundCall.findFirstIn(stripComments(line)).isDefined =>
            s"$p:${i + 1}: ${line.trim}"
        }.toList
      }
      .toList
    assert(offenders.isEmpty,
      "engine round( in main source — use Det.scaled/quant/display or the " +
        "inline floor(x * 10^s + 0.5) form on BOTH engine sides:\n" +
        offenders.mkString("\n"))
  }
}
