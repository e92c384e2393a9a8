package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The per-query bench regression gate (VERDICT r05 #6, r06 #1/#2):
  * prior-round JSON parsing (string-aware — err entries nest objects with
  * arbitrary escaped text), baseline-file selection and min-across-rounds
  * against temp-dir FIXTURES (never the live cwd — the r6 assertion on the
  * repo's newest BENCH_r*.json rotted the moment the driver dropped the
  * next round's record), the 2×-plus-absolute-floor breach rule, and the
  * breach-then-requalify adjudication protocol.
  */
class BenchGateSpec extends AnyFunSuite {

  private def fixtureDir(files: (String, String)*): java.nio.file.Path = {
    val dir = Files.createTempDirectory("benchgate")
    files.foreach { case (name, body) => Files.writeString(dir.resolve(name), body) }
    dir
  }

  test("parseQueries reads numeric entries and skips err objects and trap strings") {
    val json =
      """{"metric":"total","value":15.4,"unit":"sec","queries":{"a1_category_kpis":1.12,
        |"dedup_near":1.98,"broken":{"err":"boom {\"fake\":9.9} \" brace } in string"},
        |"a2_daily_kpis":0.78},"flagship_total":1.9,"sf":"/root/testdata/sf0.1"}""".stripMargin
    val q = Bench.parseQueries(json)
    assert(q == Map("a1_category_kpis" -> 1.12, "dedup_near" -> 1.98,
      "a2_daily_kpis" -> 0.78))
  }

  test("the committed round records parse into a usable min-baseline") {
    // round-agnostic by construction: whatever BENCH_r*.json the driver has
    // committed so far must parse and cover the headline set — no file name
    // is pinned, so the next round's record cannot rot this assertion
    val q = Bench.minBaseline()
    assert(q.contains("a1_category_kpis") && q.size > 10,
      s"expected the committed query map, got ${q.size} entries")
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
    assert(Bench.regressions(Map("subsec" -> 0.4), Map("subsec" -> 0.85)).isEmpty,
      "a >2x ratio whose absolute delta is under 0.5s is box noise " +
        "(VERDICT r16 #1c: the pipeline_fetch_priority class of flags)")
  }

  test("baseline files are environment-scoped: driver vs local records") {
    // VERDICT r16 #1a: three consecutive rc=1 rounds traced to gating
    // loaded driver-box runs against quiet-local-box minima. Driver runs
    // must gate against driver records (BENCH_r* tails + the committed
    // full BENCH_DRIVER_r* lines), local runs against BENCH_LOCAL_r*.
    val dir = fixtureDir(
      "BENCH_r01.json" -> """{"queries":{"a":3.0}}""",
      "BENCH_DRIVER_r02.json" -> """{"queries":{"a":2.5,"b":4.0}}""",
      "BENCH_LOCAL_r02.json" -> """{"queries":{"a":1.0,"b":2.0}}""")
    assert(Bench.baselineFiles(dir, env = "driver").map(_._2.getFileName.toString)
      == Seq("BENCH_r01.json", "BENCH_DRIVER_r02.json"))
    assert(Bench.baselineFiles(dir, env = "local").map(_._2.getFileName.toString)
      == Seq("BENCH_LOCAL_r02.json"))
    assert(Bench.minBaseline(dir, env = "driver") == Map("a" -> 2.5, "b" -> 4.0),
      "a driver run must never be gated against the quiet local 1.0s floor")
    assert(Bench.minBaseline(dir, env = "local") == Map("a" -> 1.0, "b" -> 2.0))
  }

  test("floorOverrides clamp verdict-retired floors up, in both environments") {
    // VERDICT r16 #1b: dedup_near's r12 local floor (1.56s) predates the
    // r14/r15 collapse-memo + hot-bucket-cap plan-cost change and no record
    // in 4 rounds approached it; the override retires it to 1.89s. The
    // clamp is max(), so an environment whose computed min already exceeds
    // the override (the driver's 3.17s) is untouched.
    val dir = fixtureDir(
      "BENCH_LOCAL_r12.json" -> """{"queries":{"dedup_near":1.56,"other":1.0}}""",
      "BENCH_DRIVER_r16.json" -> """{"queries":{"dedup_near":3.17}}""")
    assert(Bench.minBaseline(dir, env = "local")
      == Map("dedup_near" -> 1.89, "other" -> 1.0))
    assert(Bench.minBaseline(dir, env = "driver") == Map("dedup_near" -> 3.17))
    // the live repo's local baseline must reflect the retirement too
    assert(Bench.minBaseline(env = "local").get("dedup_near").forall(_ >= 1.89))
  }

  test("baselineFiles orders rounds numerically from a fixture dir") {
    val dir = fixtureDir(
      "BENCH_r02.json" -> """{"queries":{"a":1.0}}""",
      "BENCH_r07.json" -> """{"queries":{"a":2.0}}""",
      "BENCH_r10.json" -> """{"queries":{"a":3.0}}""", // r10 > r7 numerically, < lexicographically
      "BENCH_rXX.json" -> "not a round file",
      "CORRECTNESS_r07.json" -> "{}")
    assert(Bench.baselineFiles(dir).map(_._1) == Seq(2, 7, 10),
      "rounds must sort numerically and non-round files must be skipped")
    assert(Bench.baselineFiles(Files.createTempDirectory("benchgate_empty")).isEmpty,
      "round 1: no baseline, gate disabled")
  }

  test("minBaseline takes the per-query MIN across all rounds and skips garbage") {
    // r2 is the load-corrupted round: its 7.4s for `a` must NOT become the
    // yardstick when r1 proved 1.0s is achievable (VERDICT r06 #2b)
    val dir = fixtureDir(
      "BENCH_r01.json" -> """{"queries":{"a":1.0,"b":3.0}}""",
      "BENCH_r02.json" -> """{"queries":{"a":7.4,"b":0.5,"c":4.0,"bad":{"err":"x"}}}""",
      "BENCH_r03.json" -> "}{ not json at all")
    assert(Bench.minBaseline(dir) == Map("a" -> 1.0, "b" -> 0.5, "c" -> 4.0))
  }

  test("debut queries are requalified before entering the record") {
    // VERDICT r08 #1b: dedup_contained_recall debuted at a session-inflated
    // 26.9s vs a ~6s isolated truth; under min-across-rounds gating that
    // inflated debut becomes the permanent floor. qualifyDebuts must re-run
    // exactly the un-baselined, above-floor queries and keep the better of
    // the two numbers — baselined queries (the adjudicate path's job) and
    // sub-floor debuts (noise-grade) are left alone.
    val baseline = Map("old" -> 1.0)
    val first = Map("old" -> 5.0, "debut_slow" -> 26.9,
      "debut_fast" -> 3.0, "debut_tiny" -> 0.1)
    val reran = scala.collection.mutable.ListBuffer.empty[String]
    val (now, debuts, failedReruns) = Bench.qualifyDebuts(baseline, first, { name =>
      reran += name
      if (name == "debut_slow") Some(6.0) else Some(4.2)
    })
    assert(reran.toSet == Set("debut_slow", "debut_fast"),
      "only un-baselined queries above the noise floor re-run")
    assert(debuts == Seq("debut_fast", "debut_slow"))
    assert(failedReruns.isEmpty)
    assert(now("debut_slow") == 6.0, "the settled re-run replaces the inflated debut")
    assert(now("debut_fast") == 3.0, "a re-run slower than first-pass is ignored")
    assert(now("old") == 5.0, "baselined queries belong to adjudicate, not here")
    assert(now("debut_tiny") == 0.1)
    // a crashing re-run keeps the first-pass time rather than losing the
    // entry — and reports the debut as rerun-FAILED, not as qualified
    // (ADVICE r09: the trail must not claim a settled re-run that never ran)
    val (now2, qualified2, failed2) = Bench.qualifyDebuts(baseline, first, _ => None)
    assert(now2 == first)
    assert(qualified2.isEmpty, "no rerun value -> not qualified")
    assert(failed2 == Seq("debut_fast", "debut_slow"))
  }

  test("adjudicate requalifies a load blip and keeps a real regression") {
    // enough flat queries that the drift median stays 1 — this test pins
    // the REQUALIFICATION protocol, not drift normalization
    val flat = (1 to 6).map(i => s"f$i" -> 1.0).toMap
    val baseline = Map("blip" -> 1.0, "real" -> 1.0, "fine" -> 1.0) ++ flat
    val first = Map("blip" -> 2.5, "real" -> 2.6, "fine" -> 1.1) ++ flat
    val reran = scala.collection.mutable.ListBuffer.empty[String]
    val (now, regs) = Bench.adjudicate(baseline, first, { name =>
      reran += name
      if (name == "blip") Some(0.9) else Some(2.7)
    })
    assert(reran.toList == List("blip", "real", "real"),
      "every breach re-runs once; one that STAYS breached gets a second " +
        "settled re-run (r15: seven false flags survived the single-rerun " +
        "base gate on a loaded driver box) — a settled one doesn't")
    assert(now("blip") == 0.9, "the best of first-pass and re-runs stands")
    assert(now("real") == 2.6)
    assert(now("fine") == 1.1, "non-breached queries untouched")
    assert(regs == Seq(("real", 1.0, 2.6)),
      "only the still-slow query fails after requalification")
    // a re-run that itself crashes keeps the first-pass time and the breach
    val (_, regs2) = Bench.adjudicate(baseline, first, {
      case "blip" => Some(0.9)
      case _ => None
    })
    assert(regs2 == Seq(("real", 1.0, 2.6)))
  }

  test("adjudicate's DEFAULT noise floor is 0.5s, in lockstep with regressions") {
    // VERDICT r17 #1: regressions()' default floorSec was raised to 0.5 in
    // r17 but adjudicate kept its own 0.2 default — and main calls
    // adjudicate WITHOUT the parameter, so the driver's gate still flagged
    // e_daily_value on a 0.286s delta (0.15 -> 0.44). This drives the full
    // adjudicate path bare, exactly like main: a >2x blip under 0.5s of
    // absolute delta must neither re-run nor breach.
    val flat = (1 to 6).map(i => s"f$i" -> 1.0).toMap
    val baseline = Map("e_daily_value" -> 0.15, "real" -> 1.0) ++ flat
    val first = Map("e_daily_value" -> 0.44, "real" -> 2.6) ++ flat
    val reran = scala.collection.mutable.ListBuffer.empty[String]
    val (now, regs) = Bench.adjudicate(baseline, first, { name =>
      reran += name; Some(2.7)
    })
    assert(!reran.contains("e_daily_value"),
      "a sub-floor blip must not even trigger a requalification re-run")
    assert(now("e_daily_value") == 0.44)
    assert(regs == Seq(("real", 1.0, 2.6)),
      "only the above-floor regression breaches under the bare defaults")
  }

  test("drift normalization: a uniformly slower box fails nothing, a single regression still flags") {
    // VERDICT r17 #1/#2: the fourth consecutive driver rc=1 came from
    // whole-box drift tipping small untouched queries over the fixed 2×
    // (t_lm_buckets 0.96 -> 2.31 in one round, sub-second queries
    // uniformly 0.5-0.8× their floors). The gate scales its tolerance by
    // the MEDIAN now/floor ratio.
    val floors = (1 to 9).map(i => s"q$i" -> 1.0).toMap
    // box running 2.2× slow across the board: no breach
    val slowBox = floors.map { case (k, v) => k -> v * 2.2 }
    assert(Bench.regressions(floors, slowBox).isEmpty,
      "uniform drift is the box, not a regression")
    // same slow box, but one query ALSO regressed 3× on top: flags
    val oneBad = slowBox.updated("q5", 6.8)
    assert(Bench.regressions(floors, oneBad).map(_._1) == Seq("q5"))
    // a quiet box must not TIGHTEN the gate below 2× (drift clamps at 1)
    val fastBox = floors.map { case (k, v) => k -> v * 0.5 }
    assert(Bench.driftFactor(floors, fastBox) == 1.0)
    // a worse-than-3× session clamps: something is wrong beyond drift,
    // and a 7× box overwhelms the clamped 2×3 tolerance loudly
    val deadBox = floors.map { case (k, v) => k -> v * 7.0 }
    assert(Bench.driftFactor(floors, deadBox) == 3.0)
    assert(Bench.regressions(floors, deadBox).nonEmpty,
      "past the clamp the gate fails loudly instead of absorbing")
    // under 8 eligible ratios the median has no population: fixed gate
    assert(Bench.driftFactor(Map("a" -> 1.0), Map("a" -> 2.5)) == 1.0)
  }

  test("the sf1 sublinearity gate flags >10x-on-10x-data above the floor") {
    val base = Map("linear" -> 2.0, "super" -> 1.0, "tiny" -> 0.05,
      "flat" -> 3.0)
    val scaled = Map("linear" -> 19.0, // 9.5x: sublinear enough
      "super" -> 12.0, // 12x and 2s over the 10x line: flagged
      "tiny" -> 0.9, // 18x but only 0.4s over the line: noise, not flagged
      "flat" -> 3.1, // fixture-driven query, data-independent
      "debut" -> 50.0) // no base entry: nothing to compare
    assert(Bench.superlinear(base, scaled) == Seq(("super", 1.0, 12.0)))
    // the floor is parameterizable: at 0 the tiny blip flags too
    assert(Bench.superlinear(base, scaled, floorSec = 0.0).map(_._1)
      == Seq("super", "tiny"))
  }

  test("sf1 flags get a load-guard re-adjudication before committing") {
    // r13: a loaded box recorded dedup_near at 35x where a settled rerun
    // measured 7.9x — a flag must survive ONE settled re-run to commit
    val base = Map("blip" -> 1.0, "real" -> 1.0)
    val scaled = Map("blip" -> 35.0, "real" -> 30.0)
    var reruns = List.empty[String]
    val (adj, flags) = Bench.adjudicateSf1(base, scaled, { name =>
      reruns ::= name
      if (name == "blip") Some(7.9) else Some(28.0)
    })
    assert(reruns.reverse == List("blip", "real", "real"),
      "every flag re-runs once; one that STAYS flagged gets a second " +
        "settled re-run (r14: g_kcore's 18x-driver-vs-7x-local gap showed " +
        "a single rerun doesn't settle a loaded box) — a settled one doesn't")
    assert(adj("blip") == 7.9 && adj("real") == 28.0,
      "the best of first-pass and re-runs stands")
    assert(flags == Seq(("real", 1.0, 28.0)),
      "only a query that STAYS superlinear flags")
    // a failed re-run keeps the first-pass number (and the flag)
    val (adj2, flags2) = Bench.adjudicateSf1(base, scaled, _ => None)
    assert(adj2 == scaled && flags2.map(_._1) == Seq("blip", "real"))
  }
}
