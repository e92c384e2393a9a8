package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query bench regression gate (VERDICT r05 #6): prior-round JSON
  * parsing (string-aware — err entries nest objects with arbitrary escaped
  * text) and the 2×-plus-absolute-floor breach rule, including an injected
  * regression being caught.
  */
class BenchGateSpec extends AnyFunSuite {

  test("parseQueries reads numeric entries and skips err objects and trap strings") {
    val json =
      """{"metric":"total","value":15.4,"unit":"sec","queries":{"a1_category_kpis":1.12,
        |"dedup_near":1.98,"broken":{"err":"boom {\"fake\":9.9} \" brace } in string"},
        |"a2_daily_kpis":0.78},"flagship_total":1.9,"sf":"/root/testdata/sf0.1"}""".stripMargin
    val q = Bench.parseQueries(json)
    assert(q == Map("a1_category_kpis" -> 1.12, "dedup_near" -> 1.98,
      "a2_daily_kpis" -> 0.78))
  }

  test("parseQueries reads the committed prior-round record") {
    val q = Bench.parseQueries(
      java.nio.file.Files.readString(java.nio.file.Paths.get("BENCH_r05.json")))
    assert(q.contains("a1_category_kpis") && q.size > 10,
      s"expected the r5 query map, got ${q.size} entries")
    assert(q.values.forall(_ > 0.0))
  }

  test("an injected regression is caught; noise-floor and missing keys are not") {
    val prev = Map("a1" -> 1.0, "tiny" -> 0.05, "gone" -> 3.0)
    val now = Map("a1" -> 2.5, "tiny" -> 0.15, "new" -> 9.9)
    val regs = Bench.regressions(prev, now)
    assert(regs == Seq(("a1", 1.0, 2.5)),
      "exactly the real 2.5x regression must breach: " +
        "a 0.05->0.15s blip is under the absolute floor, unmatched keys are skipped")
    assert(Bench.regressions(prev, Map("a1" -> 1.9)).isEmpty, "within 2x passes")
    assert(Bench.regressions(Map.empty, now).isEmpty, "no baseline, no gate")
  }

  test("latestBaselineFile picks the highest committed round") {
    val f = Bench.latestBaselineFile()
    assert(f.exists(_.getFileName.toString == "BENCH_r05.json"),
      s"expected BENCH_r05.json in cwd, got $f")
  }
}
