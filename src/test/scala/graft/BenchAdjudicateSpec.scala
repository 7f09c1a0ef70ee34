package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's defense against machine-load poisoning. Round-9's
  * driver record shipped seven medians 6–9× above their true values with
  * individually TIGHT in-run bands — only comparison against the same
  * query's previous-round median can catch that, and [[Bench.adjudicate]]
  * encodes the policy. Pure function, no Spark session needed.
  */
class BenchAdjudicateSpec extends AnyFunSuite {

  test("a synthetic 5x-poisoned median self-corrects against the previous round") {
    // tight in-run band (spread < 3x) — the old check was blind to this
    val poisoned = Seq(0.95, 1.03, 1.10)
    val clean = Seq(0.08, 0.09, 0.10)
    val (picked, reran) = Bench.adjudicate(poisoned, Some(0.089), () => Some(clean))
    assert(reran)
    assert(picked == clean)
  }

  test("a genuine 3x+ regression reproduces and stays reported") {
    val regressed = Seq(0.95, 1.03, 1.10)
    val confirm = Seq(0.97, 1.01, 1.08) // remeasure reproduces it
    val (picked, reran) = Bench.adjudicate(regressed, Some(0.089), () => Some(confirm))
    assert(reran)
    assert(picked(1) >= 1.0) // whichever triple wins, the regression shows
  }

  test("a tight band near the previous median is not remeasured") {
    val steady = Seq(0.08, 0.09, 0.11)
    var calls = 0
    val (picked, reran) = Bench.adjudicate(steady, Some(0.089), () => { calls += 1; Some(steady) })
    assert(!reran && calls == 0 && picked == steady)
  }

  test("small absolute drift on a trivial query never triggers a rerun") {
    // 4x prev but only +60 ms — below the 0.2 s absolute floor
    val tiny = Seq(0.07, 0.08, 0.09)
    val (_, reran) = Bench.adjudicate(tiny, Some(0.02), () => fail("must not remeasure"))
    assert(!reran)
  }

  test("no previous-round record falls back to the in-run band check only") {
    val tight = Seq(0.9, 1.0, 1.1)
    val (_, r1) = Bench.adjudicate(tight, None, () => fail("must not remeasure"))
    assert(!r1)
    val wide = Seq(0.2, 0.3, 1.5)
    val tighter = Seq(0.25, 0.28, 0.33)
    val (p2, r2) = Bench.adjudicate(wide, None, () => Some(tighter))
    assert(r2 && p2 == tighter)
  }

  test("a flaked remeasure keeps the four-successful-runs first triple") {
    val wide = Seq(0.2, 0.3, 1.5)
    val (picked, reran) = Bench.adjudicate(wide, None, () => None)
    assert(reran && picked == wide)
  }

  test("loadRatio is the median per-query ratio, excluding launch-noise medians") {
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "tiny" -> 0.01)
    // uniform 1.5x host slowdown, one genuine 10x regression, one
    // launch-noise query that would skew the median if included
    val cur = Seq("a" -> 1.5, "b" -> 3.0, "c" -> 40.0, "tiny" -> 1.0, "new" -> 9.9)
    assert(Bench.loadRatio(cur, prev) === 1.5)
    // no shared queries -> neutral 1.0
    assert(Bench.loadRatio(Seq("x" -> 5.0), prev) === 1.0)
    assert(Bench.loadRatio(Nil, prev) === 1.0)
  }

  test("loadPrevMedians parses a persisted record line and tolerates absence") {
    val p = java.nio.file.Files.createTempFile("bench-prev", ".json")
    java.nio.file.Files.writeString(p,
      """{"metric":"total","value":1.2,"unit":"sec","queries":{"q1_agg":0.475,"q_topn":0.13},"query_bands":{"q1_agg":[0.4,0.475,0.5]},"sf":"x"}""")
    val m = Bench.loadPrevMedians(p)
    assert(m == Map("q1_agg" -> 0.475, "q_topn" -> 0.13))
    assert(Bench.loadPrevMedians(java.nio.file.Paths.get("/nonexistent/x.json")).isEmpty)
  }
}
