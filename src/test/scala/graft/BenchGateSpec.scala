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

  test("phase class: clean / warm transition band / suspect boundaries") {
    assert(Bench.PhaseWarmMultiSec == 0.76)
    // recorded clean sessions stay clean
    Seq(Seq(0.559, 0.62), Seq(0.649, 0.70), Seq(0.622, 0.615)).foreach { mids =>
      assert(Bench.phaseClass(mids, 0.7)._1 == "clean", mids.toString)
    }
    // the r12 driver-run window (mid mean 0.81) — the case this stamp exists
    // for: under the suspect gate, but must not read as canonical-clean
    assert(Bench.phaseClass(Seq(0.83, 0.79), 0.8)._1 == "warm")
    // boundaries: strict at both edges (exactly-at stays the lower class)
    assert(Bench.phaseClass(Seq(0.76), 0.0)._1 == "clean")
    assert(Bench.phaseClass(Seq(0.7601), 0.0)._1 == "warm")
    assert(Bench.phaseClass(Seq(0.85), 0.0)._1 == "warm")
    assert(Bench.phaseClass(Seq(0.8501), 0.0)._1 == "suspect")
    // suspect always wins over warm; evidence mean matches phaseGate's
    val (label, mean) = Bench.phaseClass(Seq(1.4777, 0.6846), 0.67)
    assert(label == "suspect" && math.abs(mean - 1.081) < 0.001)
    // reps=1 fallback uses the pre bracket, same as phaseGate
    assert(Bench.phaseClass(Nil, 0.72)._1 == "clean")
    assert(Bench.phaseClass(Nil, 0.80)._1 == "warm")
    assert(Bench.phaseClass(Nil, 1.10)._1 == "suspect")
  }

  test("mem phase class: documented band boundaries over the recorded history") {
    // r14 (verdict order #4): the bandwidth dimension gets the multi leg's
    // three-way stamp. Band tops are documented constants: 0.02 s bounds
    // the accumulated canonical mid-trace history (r10-r13 mids span
    // 0.0079-0.0190 s), 0.05 s is the suspect gate BenchDiff has used
    // since r10 (the one caught bandwidth phase measured 0.19 s).
    assert(Bench.MemWarmMultiSec == 0.02)
    assert(Bench.MemSuspectMultiSec == 0.05)
    // every recorded canonical session's mids stay clean
    Seq(Seq(0.0079, 0.0082), Seq(0.0110, 0.0088), Seq(0.0130, 0.0144),
      Seq(0.0160, 0.0190), Seq(0.0167, 0.0085)).foreach { mids =>
      assert(Bench.memPhaseClass(mids, 0.012)._1 == "clean", mids.toString)
    }
    // boundaries strict at both edges (exactly-at stays the lower class)
    assert(Bench.memPhaseClass(Seq(0.02), 0.0)._1 == "clean")
    assert(Bench.memPhaseClass(Seq(0.0201), 0.0)._1 == "warm")
    assert(Bench.memPhaseClass(Seq(0.05), 0.0)._1 == "warm")
    assert(Bench.memPhaseClass(Seq(0.0501), 0.0)._1 == "suspect")
    // the caught r10 bandwidth phase (0.19 s) stamps suspect outright
    assert(Bench.memPhaseClass(Seq(0.19, 0.012), 0.012)._1 == "suspect")
    // reps=1 fallback: the pre bracket is the evidence, as in phaseClass
    assert(Bench.memPhaseClass(Nil, 0.012)._1 == "clean")
    assert(Bench.memPhaseClass(Nil, 0.03)._1 == "warm")
    assert(Bench.memPhaseClass(Nil, 0.19)._1 == "suspect")
    // evidence mean is the mid mean, same arithmetic as the multi leg
    val (_, mean) = Bench.memPhaseClass(Seq(0.01, 0.02), 0.0)
    assert(math.abs(mean - 0.015) < 1e-9)
  }
}
