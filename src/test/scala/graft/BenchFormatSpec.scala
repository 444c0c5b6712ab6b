package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line rides a ~2000-char harness tail capture; these
  * pin the budget ladder (names for the slowest queries while they fit,
  * bare qv_cs when they don't, an explicit truncation marker when even
  * that overflows) and the failure accounting (failed queries listed, not
  * folded into the total as timeout sentinels).
  */
class BenchFormatSpec extends AnyFunSuite {

  private def mk(n: Int): Seq[(String, Either[String, Double])] =
    (1 to n).map(i => f"q_test_$i%03d" -> Right(i * 0.01))

  test("small suites keep every query name on the stdout line") {
    val line = BenchFormat.stdoutLine(mk(5), "{}", "/tmp/sf")
    assert(line.contains("\"q_test_005\":0.05"))
    assert(line.contains("\"n_q\":5") && line.contains("\"n_failed\":0"))
    assert(!line.contains("truncated"))
  }

  test("failures are listed separately and excluded from the total") {
    val rs: Seq[(String, Either[String, Double])] = Seq(
      "q_a" -> Right(1.0), "q_b" -> Left("boom"), "q_c" -> Right(2.0))
    val line = BenchFormat.stdoutLine(rs, "{}", "/tmp/sf")
    assert(line.contains("\"value\":3.000"), s"total must sum ONLY successes: $line")
    assert(line.contains("\"n_failed\":1") && line.contains("\"failed\":[\"q_b\"]"))
    // positional qv slot for the failure is the -1 marker, not a sentinel
    assert(line.contains("\"qv_cs\":[100,-1,200]"), line)
  }

  test("mid-size suites drop names before dropping qv_cs") {
    val line = BenchFormat.stdoutLine(mk(150), "{}", "/tmp/sf")
    assert(line.length <= 1700, s"over budget: ${line.length}")
    assert(line.contains("\"qv_cs\":["), "qv_cs must survive at 150 queries")
    assert(!line.contains("truncated"))
  }

  test("oversize suites emit an explicit truncation marker, never a half line") {
    // 400 queries at realistic (tens-of-seconds → 4-5 digit centisecond)
    // timings: the bare qv_cs array alone outgrows the tail budget
    val big = (1 to 400).map(i => f"q_test_$i%03d" ->
      (Right(100.0 + i): Either[String, Double]))
    val line = BenchFormat.stdoutLine(big, "{}", "/tmp/sf")
    assert(line.length <= 1700, s"over budget: ${line.length}")
    assert(line.contains("\"truncated\":true"), line)
    assert(line.contains("\"full\":\"target/bench_full.json\""), line)
    assert(line.contains("\"n_q\":400"), line)
  }
}
