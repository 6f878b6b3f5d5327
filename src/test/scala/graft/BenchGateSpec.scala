package graft

import org.scalatest.funsuite.AnyFunSuite

/** Self-test of the bench superlinearity gate (`Bench.flagSuperlinear`)
  * — feeds it a planted quadratic so the gate itself is pinned (the r6
  * gate shipped a clean bill of health computed from polluted ratios;
  * at minimum the verdict FUNCTION must provably catch a known-bad
  * input).
  */
class BenchGateSpec extends AnyFunSuite {

  test("flags a planted quadratic and only it") {
    // 10× data step: linear ≈ 10, quadratic ≈ 100.
    val ratios = Map(
      "q_linear" -> 9.8,
      "q_sublinear" -> 3.1,
      "q_quadratic" -> 98.4,
      "q_borderline_ok" -> 14.9)
    val big = Map(
      "q_linear" -> 4.0,
      "q_sublinear" -> 2.0,
      "q_quadratic" -> 12.0,
      "q_borderline_ok" -> 3.0)
    assert(Bench.flagSuperlinear(ratios, big) === Seq("q_quadratic"))
  }

  test("sub-second rows never flag (per-job overhead dominates)") {
    val ratios = Map("q_tiny" -> 40.0)
    assert(Bench.flagSuperlinear(ratios, Map("q_tiny" -> 0.4)).isEmpty)
  }

  test("error sentinel (-1) is carried, not flagged") {
    val ratios = Map("q_broken_small_scale" -> -1.0, "q_bad" -> 20.0)
    val big = Map("q_broken_small_scale" -> 5.0, "q_bad" -> 5.0)
    assert(Bench.flagSuperlinear(ratios, big) === Seq("q_bad"))
  }

  test("missing big-scale time defaults to not-flagged") {
    assert(Bench.flagSuperlinear(Map("q_x" -> 50.0), Map.empty).isEmpty)
  }

  test("re-measure fires on the r9 driver pathology, not on steady state") {
    // the archetype: gx_lpa measured 25.0s in BENCH_r09 while its warm
    // run (same process, seconds earlier) ran in ~3s — load burst
    assert(Bench.needsRemeasure(measured = 25.0, warmWall = 3.0, floor = 1.0))
    // normal shape: measured BELOW the planning+codegen-laden warm wall
    assert(!Bench.needsRemeasure(measured = 2.4, warmWall = 3.1, floor = 1.0))
    // mild in-band noise (under 3x warm) never re-runs
    assert(!Bench.needsRemeasure(measured = 5.5, warmWall = 2.0, floor = 1.0))
  }

  test("committed-fp floor fires on sustained load the warm-wall trigger misses") {
    // the r10 residue: driver ran the whole session on a hot box, so
    // warm (4.0) and measured (4.2) co-inflated — needsRemeasure never
    // fires — but the committed quiet-box record says 1.3s at the SAME
    // optimized fp: grant the re-run
    assert(!Bench.needsRemeasure(measured = 4.2, warmWall = 4.0, floor = 1.0))
    assert(Bench.committedFloorFires(4.2, "abc123", Some((1.3, "abc123"))))
    // fp mismatch = a real plan change — may legitimately cost more,
    // must stay visible, never re-run on this trigger
    assert(!Bench.committedFloorFires(4.2, "abc123", Some((1.3, "def456"))))
    // err fp can match err in a stale artifact — never fire on it
    assert(!Bench.committedFloorFires(4.2, "err", Some((1.3, "err"))))
    // within 3x of the committed time: honest variance, no re-run
    assert(!Bench.committedFloorFires(3.0, "abc123", Some((1.3, "abc123"))))
    // sub-second rows stay out (same rationale as the warm-wall floor)
    assert(!Bench.committedFloorFires(0.9, "abc123", Some((0.2, "abc123"))))
    // no committed row (new query this round) — nothing to compare
    assert(!Bench.committedFloorFires(9.9, "abc123", None))
  }

  test("re-measure floor keeps jitter-dominated sub-threshold rows out") {
    // 0.3s vs 0.05s warm is 6x but under the 1s floor — scheduler
    // jitter, not worth a re-run at the big scale
    assert(!Bench.needsRemeasure(measured = 0.3, warmWall = 0.05, floor = 1.0))
    // the ratio pass uses a lower floor: the same row DOES re-run there
    assert(Bench.needsRemeasure(measured = 0.3, warmWall = 0.05, floor = 0.2))
  }
}
