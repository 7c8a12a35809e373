package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** One monitored observation: series key + monotone sequence + cents value. */
final case class SeriesPoint(series: String, seq: Long, x: Long)

/** Per-observation Page-Hinkley readings on the den-scaled cents grid. */
final case class PhPoint(series: String, seq: Long, ph_up: Long, ph_dn: Long)

/** Running PH state: cumulative deviation and its running extrema.
  * minM/maxM start at the Long sentinels so the first observation
  * defines them — matching the batch window min/max over monitor rows
  * (no virtual zeroth row).
  */
final case class PhState(m: Long, minM: Long, maxM: Long)

/** Streaming sibling of [[graft.operators.Temporal.q126PageHinkley]]:
  * the online Page-Hinkley drift detector (Page 1954) with a FROZEN
  * reference mean shipped as config — the monitoring deployment shape
  * (the reference window is an artifact of the last training run, as
  * with `Temporal.driftCountsFrom`'s frozen histogram edges). Batch
  * q123/q126 localize a shift retrospectively; this emits the same
  * den-scaled PH statistics per observation as data arrives, carrying
  * the cumulative-deviation state across micro-batches.
  *
  * Semantics notes (the RollingAnomaly discipline):
  *  - rows inside a micro-batch are sorted by seq before the replay —
  *    PH is order-sensitive and Spark does not order rows within a
  *    group; cross-batch equivalence needs per-key seq monotonicity
  *    across batches (in-order replay gives it).
  *  - the deviation is den·x − num (num = Σ reference cents, den =
  *    |reference|), so state and outputs stay EXACT integers on the
  *    den-scaled cents grid — batch/stream equality is exact.
  *  - state is three longs per key; RocksDB provider required, as for
  *    all transformWithState operators here.
  */
class PageHinkleyProcessor(mu0Num: Long, mu0Den: Long)
    extends StatefulProcessor[String, SeriesPoint, PhPoint] {

  @transient private var st: ValueState[PhState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[PhState]("ph",
      Encoders.product[PhState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[SeriesPoint],
                               timerValues: TimerValues): Iterator[PhPoint] = {
    var s = if (st.exists()) st.get()
      else PhState(0L, Long.MaxValue, Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer.empty[PhPoint]
    rows.toSeq.sortBy(_.seq).foreach { r =>
      val m = s.m + (mu0Den * r.x - mu0Num)
      val minM = math.min(s.minM, m)
      val maxM = math.max(s.maxM, m)
      out += PhPoint(key, r.seq, m - minM, maxM - m)
      s = PhState(m, minM, maxM)
    }
    st.update(s)
    out.iterator
  }
}

object PageHinkley {
  /** input columns: series, seq, x (cents). Constants (num, den) are the
    * frozen reference-window sum and count.
    */
  def apply(df: DataFrame, mu0Num: Long, mu0Den: Long): Dataset[PhPoint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("series"), col("seq"), col("x"))
      .as[SeriesPoint]
      .groupByKey(_.series)
      .transformWithState(new PageHinkleyProcessor(mu0Num, mu0Den),
        TimeMode.None(), OutputMode.Update())
  }
}
