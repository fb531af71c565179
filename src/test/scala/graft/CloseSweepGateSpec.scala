package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the close-sweep health gate's robust spread metric (round 17,
  * r16 verdict #1).
  *
  * The r16 gate used raw max/min over the sentinel series, so a single
  * fast dip marked a genuinely quiet box unhealthy — the gate exited 3
  * on every sweep it ever ran, making "healthy" unreachable. The round
  * 17 gate trims one min + one max (n >= 5) before the spread and gates
  * the LAST reading separately against the trimmed median (tail-onset
  * drift is what the trim would hide). The synthetic-series pins —
  * including the observed r16 dip shape and the r15 monotone-drift
  * shape — live in `tools/close_sweep.py --selftest`; this spec keeps
  * them inside `sbt test` so a gate edit that reclassifies any shape
  * fails the suite, not just a manual run.
  */
class CloseSweepGateSpec extends AnyFunSuite {

  test("close_sweep.py --selftest classifies every pinned series shape") {
    import scala.sys.process._
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'),
      l => buf.append(l).append('\n'))
    val rc = Process(Seq("python3", "tools/close_sweep.py", "--selftest"),
      new java.io.File(sys.props.getOrElse("user.dir", "."))).!(logger)
    assert(rc == 0, s"selftest failed:\n$buf")
    assert(buf.toString.contains("all shapes classify correctly"), buf)
    // the two shapes the round-17 fix is FOR must be present by name
    assert(buf.toString.contains("r16-observed-dip"), buf)
    assert(buf.toString.contains("r15-monotone-drift"), buf)
  }
}
