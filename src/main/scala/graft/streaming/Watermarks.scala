package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked event-time aggregation — the late-data policy the
  * reference cannot express (DStream API predates watermarks; its
  * cumulative state grows forever, acknowledged at
  * KafkaStreamAverageCalculator.java:97-99; SURVEY.md §2.7 row
  * "Watermarks / late data").
  *
  * `withWatermark(ts, delay)` bounds state: windows older than
  * max(event time) − delay are finalized (emitted once in Append mode)
  * and their state evicted; events arriving after their window is
  * finalized are DROPPED — the deterministic late-data contract, pinned
  * by StreamingSpec's out-of-order test.
  *
  * At 100 TB this is the difference between O(open windows) and O(all
  * windows ever) state; combined with the RocksDB state store
  * (see [[graft.GraftSession]] / StreamingSpec) it is the standard
  * production configuration.
  */
object Watermarks {

  /** Tumbling-window count/sum with a watermark. Append mode: each
    * window is emitted exactly once, when the watermark passes its end.
    * `tsCol` is a column NAME (withWatermark requires a resolvable
    * attribute, not an arbitrary expression).
    */
  def windowedAgg(events: DataFrame, tsCol: String, value: Column,
                  windowLength: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLength).as("w"))
      .agg(count(lit(1)).as("n"), sum(value).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("n"), col("sum_value"))

  /** Watermarked session windows — the streaming form of
    * [[graft.operators.EventWindows.q16SessionWindow]]: sessions close
    * when the watermark passes last-event + gap, state is evicted on
    * close.
    */
  def sessionAgg(events: DataFrame, tsCol: String, key: Column, value: Column,
                 gap: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(key.as("key"), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n"), sum(value).as("sum_value"))
      .select(col("key"), col("sw.start").as("s_start"),
        col("sw.end").as("s_end"), col("n"), col("sum_value"))
}
