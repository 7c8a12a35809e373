package graft.fidelity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Byte-faithful rebuild of the reference's 8-slot per-key state vector
  * (KafkaStreamAverageCalculator.java:102-171), as a typed
  * `Aggregator[Double, StatsBuf, StatsResult]` for the fidelity harness
  * (SURVEY.md §2.4.1 option 2, §5.2.6).
  *
  * Quirk switches (SURVEY.md §2.7 fidelity register):
  *  - `sentinelInit` (Q1, `AVG:105`): when true, min starts at -10.0 and
  *    max at -150.0 — the reference's semantically-odd initializers, under
  *    which no minimum above -10 can ever be reported. Default false →
  *    +∞/-∞ (correct semantics).
  *  - Q3 `delta` leak (`AVG:121,165`): the buffer carries the last
  *    record's Welford delta, order-dependent exactly like the reference.
  *  - Q6: the count accumulates in a Double (`AVG:109,136`) — exact only
  *    to 2^53, faithfully.
  *
  * `reduce` replays the reference's per-record loop (`AVG:134-150`) in the
  * same statement order, so a single-partition run is bit-identical to the
  * reference's sequential Welford. `merge` uses the Chan et al. pairwise
  * moment combination — the distributed path is mathematically equal but
  * can differ in ulps from strict sequential order (SURVEY.md §7.5.3);
  * fidelity comparisons therefore run single-partition.
  */
case class StatsBuf(
    var summer: Double, var counter: Double, var sumsqr: Double,
    var bestmin: Double, var bestmax: Double, var mean: Double,
    var m2: Double, var variance: Double, var delta: Double)

case class StatsResult(
    summer: Double, counter: Double, sumsqr: Double, delta: Double,
    bestmin: Double, bestmax: Double, mean: Double, m2: Double,
    variance: Double)

class WelfordAggregator(sentinelInit: Boolean = false)
    extends Aggregator[Double, StatsBuf, StatsResult] {

  override def zero: StatsBuf =
    if (sentinelInit)
      StatsBuf(0.0, 0.0, 0.0, -10.0, -150.0, 0.0, 0.0, 0.0, 0.0)
    else
      StatsBuf(0.0, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, 0.0, 0.0, 0.0)

  override def reduce(b: StatsBuf, x: Double): StatsBuf = {
    // Statement order mirrors the reference loop (AVG:135-143): sums,
    // then the Welford delta/mean/m2 updates, then min/max. The variance
    // guard (AVG:146-150) runs after the loop in the reference; deriving
    // it per record from the same m2/counter yields the identical value.
    b.summer += x
    b.counter += 1.0
    b.sumsqr += x * x
    b.delta = x - b.mean
    b.mean += b.delta / b.counter
    b.m2 += b.delta * (x - b.mean)
    b.bestmin = math.min(b.bestmin, x)
    b.bestmax = math.max(b.bestmax, x)
    b.variance = if (b.counter > 1.0) b.m2 / (b.counter - 1.0) else 0.0
    b
  }

  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf = {
    if (b.counter == 0.0) return a
    if (a.counter == 0.0) return b
    val n = a.counter + b.counter
    val d = b.mean - a.mean
    val mean = a.mean + d * (b.counter / n)
    val m2 = a.m2 + b.m2 + d * d * (a.counter * b.counter / n)
    a.summer += b.summer
    a.sumsqr += b.sumsqr
    a.bestmin = math.min(a.bestmin, b.bestmin)
    a.bestmax = math.max(a.bestmax, b.bestmax)
    a.mean = mean
    a.m2 = m2
    a.counter = n
    a.variance = if (n > 1.0) m2 / (n - 1.0) else 0.0
    a.delta = b.delta // later partition's leak wins, like the reference's race
    a
  }

  override def finish(b: StatsBuf): StatsResult =
    StatsResult(b.summer, b.counter, b.sumsqr, b.delta, b.bestmin, b.bestmax,
      b.mean, b.m2, b.variance)

  override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  override def outputEncoder: Encoder[StatsResult] = Encoders.product[StatsResult]
}
