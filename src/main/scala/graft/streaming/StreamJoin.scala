package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the SURVEY.md §2.7 "Joins"
  * row's streaming commitment (the reference's DStream API cannot join
  * streams at all; its one stream is keyed state, AVG:102-171).
  *
  * Semantics: inner join of `left` and `right` on `keyCol`, keeping the
  * pairs where `right.ts ∈ (left.ts, left.ts + boundSeconds]` — the
  * "effect follows cause within a bound" shape (click → purchase,
  * request → error). Matches emit as soon as both rows have arrived
  * (inner-join append mode); the watermark + the time-interval condition
  * are what BOUND the join state: Spark evicts a buffered left row once
  * the watermark passes `l.ts + bound` (no future right row can reach
  * it) and a right row once the watermark passes `r.ts`, and drops
  * later-than-watermark input outright. Without the interval condition
  * both buffers grow forever — state O(all rows ever) — so the bound is
  * load-bearing at 100 TB, not a tuning nicety. Pinned by WatermarkSpec.
  *
  * The SAME code path serves the batch shape (q37): `withWatermark` on a
  * non-streaming frame is removed by Catalyst's
  * `EliminateEventTimeWatermark`, leaving an ordinary range-bounded
  * equi-join that shuffles once on the key — so the oracle-checked batch
  * query and the streaming query share one implementation, the
  * declarative-fidelity discipline used for q16/q17.
  */
object StreamJoin {

  /** Columns of both sides are prefixed `l_` / `r_` (a self-join must not
    * collide), watermarks applied per side, and the join condition is
    *   l_key = r_key AND r_ts ∈ (l_ts, l_ts + bound].
    * `tsCol` must be the event-time column of BOTH inputs.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, delay: String, boundSeconds: Long): DataFrame = {
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq: _*)
      .withWatermark(s"l_$tsCol", delay)
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
      .withWatermark(s"r_$tsCol", delay)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") > col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $boundSeconds SECONDS"))
  }

  /** Stream-static enrichment join: each micro-batch of `stream` joined
    * against the STATIC `dim` (a dimension table re-read per batch only
    * if its source changes — no streaming state at all, unlike
    * [[intervalJoin]]'s two watermark-bounded buffers). The dim side is
    * broadcast explicitly: at 100 TB of stream the per-batch join must
    * not shuffle the stream, and a dimension small enough to enrich with
    * is small enough to broadcast — the same rule as q2's star join.
    * `how` = "inner" drops unmatched events, "left" keeps them with null
    * dim columns (the usual enrich-then-route shape).
    */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String,
             how: String = "inner"): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), how)
}
