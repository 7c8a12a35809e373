package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** One event on the anomaly stream: µs event time + cents value. */
final case class AnomalyEvent(event_type: String, tus: Long, event_id: Long, vc: Long)

/** An event flagged by the rolling fence — the same row shape q64 emits. */
final case class AnomalyHit(event_type: String, event_id: Long, value: Double, n: Long)

/** Trailing window of the previous ≤ frame−1 cents values for one key. */
final case class AnomalyRing(vals: Seq[Long])

/** Streaming sibling of [[graft.operators.EventWindows.q64RollingAnomaly]]:
  * the SAME 3σ fence over the trailing 24 events per type, run as a
  * `transformWithState` ring buffer so the frame carries ACROSS
  * micro-batches — an event early in epoch k is judged against events
  * from epoch k−1, exactly as the batch window judges it against its
  * file-order predecessors. RollingAnomalyStreamSpec replays the events
  * table in time-ordered chunks and asserts the streamed hit set equals
  * the batch q64 output row-for-row.
  *
  * Semantics notes:
  *  - rows inside a micro-batch are sorted by (tus, event_id) before the
  *    replay — Spark does not order rows within a group, and the fence
  *    is order-sensitive. The sort is per KEY per BATCH (bounded by the
  *    trigger size, not the stream), the same discipline the batch
  *    window's ORDER BY provides globally. Equivalence therefore needs
  *    per-key event-time monotonicity ACROSS batches (replay chunks cut
  *    in time order give it); out-of-order arrivals would need a
  *    watermark + buffer stage in front, which is q37's machinery.
  *  - state is one ≤ 23-long ring per key — O(|types| · frame), the
  *    bounded-state profile a monitor wants; RocksDB provider required,
  *    as for all transformWithState operators here.
  *  - all arithmetic is the exact integer fence of q64 — no FP anywhere,
  *    so batch/stream equality is exact, not approximate.
  */
class RollingAnomalyProcessor(frame: Int = 24, minN: Int = 12, k2: Long = 9L)
    extends StatefulProcessor[String, AnomalyEvent, AnomalyHit] {

  @transient private var ring: ValueState[AnomalyRing] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getValueState[AnomalyRing]("ring",
      Encoders.product[AnomalyRing], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[AnomalyEvent],
                               timerValues: TimerValues): Iterator[AnomalyHit] = {
    var buf = if (ring.exists()) ring.get().vals else Seq.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyHit]
    rows.toSeq.sortBy(r => (r.tus, r.event_id)).foreach { r =>
      val win = (buf :+ r.vc).takeRight(frame)
      val n = win.length.toLong
      if (n >= minN) {
        val s = win.sum
        val sxx = win.map(v => v * v).sum
        if ((n * r.vc - s) * (n * r.vc - s) > k2 * (n * sxx - s * s))
          out += AnomalyHit(key, r.event_id, r.vc.toDouble / 100.0, n)
      }
      buf = win.takeRight(frame - 1)
    }
    ring.update(AnomalyRing(buf))
    out.iterator
  }
}

object RollingAnomaly {
  /** input columns: event_type, tus (µs), event_id, vc (cents). */
  def apply(df: DataFrame): Dataset[AnomalyHit] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("event_type"), col("tus"), col("event_id"), col("vc"))
      .as[AnomalyEvent]
      .groupByKey(_.event_type)
      .transformWithState(new RollingAnomalyProcessor(),
        TimeMode.None(), OutputMode.Update())
  }
}
