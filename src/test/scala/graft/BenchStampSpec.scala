package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.contentionStamp (r10 verdict #5): the bench artifact self-labels
  * host contention so a contaminated regeneration never needs manual
  * adjudication against the committed artifact. One quiet and one
  * contended series are demonstrated, both shaped like real sentinel
  * logs from r9/r10 runs.
  */
class BenchStampSpec extends AnyFunSuite {

  test("quiet series (r10 committed band 0.05-0.17) is not contended") {
    val quiet = Seq(0.06, 0.08, 0.11, 0.09, 0.17, 0.05, 0.12, 0.10)
    val (median, contended) = Bench.contentionStamp(quiet)
    assert(!contended)
    assert(median > 0.05 && median < 0.15)
  }

  test("contended series (r10 post-close shape, spikes to 0.36) stamps true") {
    // the driver's post-close regeneration: whole-sweep contention, not a
    // single spike — median shifted well above the quiet band
    val contendedSeries = Seq(0.28, 0.31, 0.36, 0.25, 0.33, 0.29, 0.35)
    val (median, contended) = Bench.contentionStamp(contendedSeries)
    assert(contended)
    assert(median > 2.0 * Bench.QuietSentinelMedian)
  }

  test("a single spike in an otherwise quiet series does NOT stamp") {
    // median-based: one GC pause / scheduler hiccup is normal jitter
    val oneSpike = Seq(0.07, 0.09, 0.36, 0.08, 0.11, 0.06, 0.10)
    val (_, contended) = Bench.contentionStamp(oneSpike)
    assert(!contended)
  }

  test("edge cases: empty and single-element series") {
    assert(Bench.contentionStamp(Nil) == ((0.0, false)))
    assert(Bench.contentionStamp(Seq(0.5)) == ((0.5, true)))
    assert(Bench.contentionStamp(Seq(0.1)) == ((0.1, false)))
  }

  test("even-length series uses the mean of the middle pair") {
    val (median, _) = Bench.contentionStamp(Seq(0.1, 0.2, 0.3, 0.4))
    assert(math.abs(median - 0.25) < 1e-12)
  }
}
