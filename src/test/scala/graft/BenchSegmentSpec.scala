package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the mid-sweep calibration segmentation (round-15 verdict item
  * 1): the round-15 driver run drifted 0.026 → 0.051 against an idle
  * reference of 0.027 and self-reported CLEAN because only the sweep
  * endpoints were probed (ratio 1.98, just under the 2× trigger) — a
  * uniform 1.34× inflation then read as a code regression. The
  * per-segment flags must catch exactly that scenario, and must NOT
  * flag an idle run's jitter. */
class BenchSegmentSpec extends AnyFunSuite {

  private val IdleRef = 0.027

  test("idle-run jitter does not flag") {
    // the r16 smoke run's actual marks: max 0.036 = 1.33× idle
    val marks = Seq(0.027, 0.030, 0.025, 0.025, 0.030, 0.028, 0.029, 0.036, 0.024)
    assert(Bench.segmentFlags(marks, IdleRef).forall(!_))
  }

  test("the round-15 drift scenario flags its late segments only") {
    // gradual drift toward the recorded 0.051 end probe: early segments
    // clean, late segments (>1.5× = 0.0405) flagged
    val marks = Seq(0.026, 0.027, 0.030, 0.034, 0.038, 0.043, 0.047, 0.051)
    val flags = Bench.segmentFlags(marks, IdleRef)
    assert(flags.take(3).forall(!_), s"early segments must stay clean: $flags")
    assert(flags.drop(4).forall(identity), s"late segments must flag: $flags")
  }

  test("a sharp mid-sweep spike flags the spiked segment only") {
    val marks = Seq(0.027, 0.026, 0.080, 0.027, 0.026)
    val flags = Bench.segmentFlags(marks, IdleRef)
    assert(flags == Seq(false, true, true, false))
  }

  test("one flag per consecutive mark pair") {
    assert(Bench.segmentFlags(Seq(0.027, 0.027), IdleRef).size == 1)
    assert(Bench.segmentFlags(Seq.fill(9)(0.027), IdleRef).size == 8)
  }
}
