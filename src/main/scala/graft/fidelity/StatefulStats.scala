package graft.fidelity

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** The 10-field wire row of the reference's output POJO
  * (SparkStreamingStatisticsProcessingResult.java:5-14), keyed.
  */
final case class KeyedStats(
    readTag_id: String, summer: Double, counter: Double, sumsqr: Double,
    delta: Double, bestmin: Double, bestmax: Double, mean: Double,
    m2: Double, variance: Double)

/** Imperative streaming port of the reference's `updateStateByKey` state
  * machine (KafkaStreamAverageCalculator.java:102-171) on the
  * `transformWithState` API — SURVEY.md §7.2's byte-fidelity STREAMING
  * path, complementing the batch [[WelfordAggregator]].
  *
  * Each micro-batch replays the per-record loop (`AVG:134-150`, via
  * `WelfordAggregator.reduce`, which mirrors its statement order) against
  * a per-key `ValueState[StatsBuf]` that persists across batches — the
  * exact shape of the reference's `Double[8]` state vector carried by
  * `updateStateByKey`. Unlike the declarative aggregate (partial
  * aggregation + Chan-style merges, ulp-level divergence possible), this
  * path is STRICTLY SEQUENTIAL per key: every record passes through the
  * same Welford statement order the reference executes, across any number
  * of micro-batches — including the order-dependent `delta` loop-leak
  * (quirk Q3) and the optional sentinel min/max initializers (quirk Q1).
  *
  * Scale: state is one 9-double buffer per key (O(distinct keys), not
  * O(rows)), partitioned by group key across executors; per-batch work is
  * one shuffle on the key. Requires the RocksDB state store provider (the
  * 100 TB state mitigation, SURVEY.md §7.5.2) — `transformWithState`
  * rejects the default HDFS-backed provider.
  */
class StatefulStatsProcessor(sentinelInit: Boolean = false,
                             ttl: Option[java.time.Duration] = None)
    extends StatefulProcessor[String, (String, Double), KeyedStats] {

  @transient private var state: ValueState[StatsBuf] = _
  @transient private lazy val agg = new WelfordAggregator(sentinelInit)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[StatsBuf]("stats",
      Encoders.product[StatsBuf],
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                               timerValues: TimerValues): Iterator[KeyedStats] = {
    var buf = if (state.exists()) state.get() else agg.zero
    rows.foreach { case (_, x) => buf = agg.reduce(buf, x) }
    state.update(buf)
    Iterator.single(KeyedStats(key, buf.summer, buf.counter, buf.sumsqr,
      buf.delta, buf.bestmin, buf.bestmax, buf.mean, buf.m2, buf.variance))
  }
}

object StatefulStats {

  /** Kafka-wire projection with the reference's exact 10-field order
    * (`MODEL:5-14`) — unlike [[graft.streaming.RunningStats.toWire]],
    * `delta` here is the REAL order-dependent loop-leak and `counter`
    * serializes as a Double, both faithful to the reference's Jackson
    * output.
    */
  def toWire(ds: Dataset[KeyedStats]): DataFrame =
    ds.select(col("readTag_id").as("key"),
      org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(
          col("readTag_id"), col("summer"), col("counter"), col("sumsqr"),
          col("delta"), col("bestmin"), col("bestmax"), col("mean"),
          col("m2"), col("variance").as("var"))).as("value"))

  /** Session-conf key enabling the optional state TTL (SURVEY §2.7
    * Watermarks row: "optional state TTL as 100 TB hygiene"). Accepts a
    * Spark time string ("30s", "10m", "1h"). Default (unset) keeps the
    * reference's unbounded-state semantics (`AVG:97-99` acknowledges the
    * risk and keeps every key forever) — TTL is strictly opt-in.
    */
  val TtlConfKey = "spark.graft.stats.ttl"

  /** Streaming (key, value) frame → per-batch updated [[KeyedStats]]
    * rows, one per key that received records (the reference's
    * once-per-updated-key-per-batch cadence).
    *
    * TTL: pass `ttl` explicitly or set [[TtlConfKey]] on the session; a
    * key idle past the TTL has its state evicted (RocksDB cleans it up —
    * the 100 TB bound on distinct-key cardinality) and re-initializes
    * from `agg.zero` on its next record. The declarative equivalent for
    * bounded state is event-time watermarking ([[graft.streaming
    * .Watermarks]]); TTL is the processing-time analogue for this
    * watermark-less running-stats shape.
    *
    * Operational caveat: with TTL the engine runs a (possibly empty)
    * micro-batch every trigger to advance the expiry clock, so
    * `processAllAvailable()` never observes a quiescent stream — drive
    * TTL'd queries by awaiting sink contents (see StateTtlSpec).
    */
  def apply(df: DataFrame, key: Column, value: Column,
            sentinelInit: Boolean = false,
            ttl: Option[java.time.Duration] = None): Dataset[KeyedStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val effTtl = ttl.orElse(spark.conf.getOption(TtlConfKey).map(s =>
      java.time.Duration.ofMillis(
        org.apache.spark.network.util.JavaUtils.timeStringAsMs(s))))
    // TTL bookkeeping needs a processing-time clock; without TTL keep
    // TimeMode.None() so the default path is byte-identical to round 4.
    val mode = if (effTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    df.select(key.cast(StringType).as("k"), value.cast(DoubleType).as("v"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new StatefulStatsProcessor(sentinelInit, effTtl),
        mode, OutputMode.Update())
  }
}
