package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure arithmetic of the bench protocol — the pieces whose
  * regressions have each cost a full measurement run: the storm
  * detection boundary, the escalation rounding (r5 ADVICE: rounding
  * after the env cap made a non-50-multiple cap unreachable), and the
  * 2-slot deadline cap. No Spark session — policy only.
  */
class BenchPolicySpec extends AnyFunSuite {

  test("storm calibration boundary (half the quiet 60-site floor)") {
    assert(Bench.isStormCalibration(107.0), "a 7x-slow window is a storm")
    assert(Bench.isStormCalibration(369.9))
    assert(!Bench.isStormCalibration(370.0), "boundary itself is quiet")
    assert(!Bench.isStormCalibration(740.0))
  }

  test("escalation reaches a non-50-multiple env cap exactly (r5 ADVICE)") {
    // old formula: min(630, min(750, 10000)) / 50 * 50 = 600 — the cap
    // 630 could never be landed; the candidate must round BEFORE capping
    assert(Bench.nextEscalationScale(630, 300, affordable = 10000) === 630)
    // and a cap that IS a 50-multiple still lands exactly
    assert(Bench.nextEscalationScale(500, 300, affordable = 10000) === 500)
  }

  test("escalation growth is budget- and 2.5x-bounded, 50-rounded") {
    // affordability binds: 0.6x-budget affords only 420 sites -> 400
    assert(Bench.nextEscalationScale(1000, 300, affordable = 420) === 400)
    // growth cap binds: 2.5 x 100 = 250
    assert(Bench.nextEscalationScale(1000, 100, affordable = 10000) === 250)
    // nothing affordable -> rounds to 0 (caller's >=1.5x-cur gate rejects)
    assert(Bench.nextEscalationScale(1000, 300, affordable = 40) === 0)
  }

  test("t2 deadline cap: 4.6x the recorded 8-slot min, 45s floor") {
    // no t8 leg recorded -> the base deadline stands
    assert(Bench.t2DeadlineCap(333.0, None) === 333.0)
    // recorded t8 = 28.1s -> cap at 129.3s (the r5 run-18 cancel point)
    val capped = Bench.t2DeadlineCap(333.0, Some(28.1))
    assert(math.abs(capped - 4.6 * 28.1) < 1e-9)
    // tiny t8 -> the flat 45s floor keeps cheap retries possible
    assert(Bench.t2DeadlineCap(333.0, Some(3.0)) === 45.0)
    // a base deadline already below the cap is never raised
    assert(Bench.t2DeadlineCap(50.0, Some(28.1)) === 50.0)
  }
}
