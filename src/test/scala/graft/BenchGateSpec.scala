package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 canonical-run phase gate (BASELINE.md): the stamp that
  * disqualifies a throttled recording rests on this arithmetic, so its
  * threshold and fallback must not drift silently.
  */
class BenchGateSpec extends AnyFunSuite {

  test("gate fires on the observed throttle phases, not on clean windows") {
    // clean sessions recorded across r10–r12 (BASELINE.md rationale)
    Seq(Seq(0.559, 0.62), Seq(0.649, 0.70), Seq(0.703, 0.631), Seq(0.646, 0.677))
      .foreach { mids =>
        val (suspect, _) = Bench.phaseGate(mids, 0.7)
        assert(!suspect, s"clean mids $mids must not stamp")
      }
    // the caught r12 case: mid1 inside a throttle phase, mid2 clean —
    // mean 1.081 stamps even though one sample recovered
    val (caught, mean) = Bench.phaseGate(Seq(1.4777, 0.6846), 0.67)
    assert(caught && math.abs(mean - 1.081) < 0.001)
    // fully-throttled r11 window
    assert(Bench.phaseGate(Seq(1.13, 1.09), 0.66)._1)
  }

  test("with no mid probes (reps=1) the pre bracket is the evidence") {
    assert(Bench.phaseGate(Nil, 0.72) == ((false, 0.72)))
    assert(Bench.phaseGate(Nil, 1.10) == ((true, 1.10)))
  }

  test("the threshold is the documented 0.85 s") {
    assert(Bench.PhaseSuspectMultiSec == 0.85)
    assert(!Bench.phaseGate(Seq(0.85), 0.0)._1, "gate is strict: exactly-at stays clean")
    assert(Bench.phaseGate(Seq(0.8501), 0.0)._1)
  }
}
