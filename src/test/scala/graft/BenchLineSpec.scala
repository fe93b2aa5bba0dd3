package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout line under the driver's capture budget AT BUILD
  * TIME. The driver stores only the last ~2000 chars of the bench run's
  * stdout, and sbt's trailing "[success] Total time: …" line (~75 chars)
  * shares that window — rounds 1, 7, 8 and 9 all shipped `parsed: null`
  * by letting the line creep past the real ~1850-char budget. The spec
  * renders the EXACT emitted line shape (same renderer, same key lists as
  * Bench.main) at worst-plausible value widths, so adding a metric to the
  * stdout subset fails here, during `sbt test`, instead of at judging
  * time. New metrics belong in BENCH_FULL.json; promote one to stdout
  * only by trading another out.
  */
class BenchLineSpec extends AnyFunSuite {

  test("worst-case stdout line stays under the driver capture budget") {
    val line = Bench.worstCaseLine
    assert(line.length <= Bench.stdoutLineBudget,
      s"rendered ${line.length} chars > ${Bench.stdoutLineBudget}: " +
        "trim stdoutQueryKeys/stdoutStructuralKeys/stdoutScaleKeys " +
        "(full detail always rides in BENCH_FULL.json)")
    // leave headroom for value-width surprises (a 6-digit rps, a 5-digit
    // second count): the worst-case render itself should sit well inside
    assert(line.length <= Bench.stdoutLineBudget - 100,
      s"worst-case line ${line.length} chars is within 100 of the " +
        "budget — trim now, before a wider value ships a truncated round")
  }

  test("worst-case line is valid JSON with the contract keys") {
    val line = Bench.worstCaseLine
    // no JSON lib on the test classpath — structural sanity: balanced
    // braces/brackets, the driver-contract keys present, no trailing junk
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '[') == line.count(_ == ']'))
    for (k <- Seq("\"metric\":", "\"value\":", "\"unit\":\"sec\"",
        "\"queries\":", "\"scale10\":", "\"failed\":", "\"sf\":",
        "\"canary\":", "\"full\":\"BENCH_FULL_c"))
      assert(line.contains(k), s"missing contract key $k")
  }

  test("failed list is capped so a mass failure cannot blow the budget") {
    val many = (1 to 60).map(i => s"q_some_long_query_name_$i")
    val rendered = Bench.capList(many)
    assert(rendered.length < 250)
    assert(rendered.contains("+54 more"))
    assert(Bench.capList(Nil) == "[]")
    assert(Bench.capList(Seq("a", "b")) == "[\"a\",\"b\"]")
  }
}
