package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.fidelity.{StatsBuf, WelfordAggregator}

/** Property tests for the fidelity aggregator (SURVEY.md §5.2.1):
  * the Q4 naive-variance identity (`AVG:174-182`), sequential-vs-merged
  * agreement, and the Q1 sentinel quirk. Deterministic seeded randoms —
  * 100 trials per property.
  */
class WelfordSpec extends AnyFunSuite {
  private val agg = new WelfordAggregator(sentinelInit = false)

  private def run(xs: Seq[Double]): StatsBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def randomSeqs(seed: Int): Iterator[Seq[Double]] = {
    val rnd = new Random(seed)
    Iterator.continually {
      val n = 2 + rnd.nextInt(200)
      Seq.fill(n)((rnd.nextDouble() - 0.3) * 1000.0)
    }.take(100)
  }

  test("Q4 identity: welford var equals naive (sumsqr - sum^2/n)/(n-1)") {
    for (xs <- randomSeqs(1)) {
      val b = run(xs)
      val naive = (b.sumsqr - b.summer * b.summer / b.counter) / (b.counter - 1)
      assert(math.abs(b.variance - naive) <= math.max(1e-8, math.abs(naive) * 1e-8),
        s"welford=${b.variance} naive=$naive n=${xs.length}")
    }
  }

  test("merge of split halves agrees with the sequential loop") {
    for (xs <- randomSeqs(2)) {
      val seq = run(xs)
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = agg.merge(run(l), run(r))
      for ((name, a, b) <- Seq(
          ("summer", seq.summer, merged.summer),
          ("counter", seq.counter, merged.counter),
          ("mean", seq.mean, merged.mean),
          ("m2", seq.m2, merged.m2),
          ("variance", seq.variance, merged.variance),
          ("bestmin", seq.bestmin, merged.bestmin),
          ("bestmax", seq.bestmax, merged.bestmax)))
        assert(math.abs(a - b) <= math.max(1e-8, math.abs(a) * 1e-8),
          s"$name: sequential=$a merged=$b")
    }
  }

  test("permutation invariance of the final statistics (within FP tolerance)") {
    val rnd = new Random(3)
    for (xs <- randomSeqs(4)) {
      val b1 = run(xs)
      val b2 = run(rnd.shuffle(xs))
      assert(math.abs(b1.variance - b2.variance) <=
        math.max(1e-7, math.abs(b1.variance) * 1e-7))
      assert(b1.bestmin == b2.bestmin && b1.bestmax == b2.bestmax)
      assert(b1.counter == b2.counter)
    }
  }

  test("Q1 sentinel mode: min can never exceed -10, max floor at -150") {
    val sentinel = new WelfordAggregator(sentinelInit = true)
    val xs = Seq(5.0, 20.0, 300.0) // all above -10
    val b = xs.foldLeft(sentinel.zero)(sentinel.reduce)
    assert(b.bestmin == -10.0, "sentinel min sticks at -10 for positive data")
    assert(b.bestmax == 300.0)
    val neg = Seq(-500.0, -20.0)
    val b2 = neg.foldLeft(sentinel.zero)(sentinel.reduce)
    assert(b2.bestmin == -500.0)
    assert(b2.bestmax == -20.0, "any real value above -150 wins")
  }

  test("delta carries the last record's Welford residual (Q3)") {
    val xs = Seq(1.0, 2.0, 6.0)
    val b = run(xs)
    // mean before last record = 1.5; delta = 6 - 1.5
    assert(b.delta == 4.5)
  }
}
