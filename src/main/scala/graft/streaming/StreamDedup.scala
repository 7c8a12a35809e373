package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingest dedup — the streaming form of the curation pipeline's
  * exact-dedup stage ([[graft.operators.Dedup.d40ExactGroups]] /
  * `dedupExact`), for deduplicating a document stream AT INGEST rather
  * than in periodic batch sweeps.
  *
  * Two semantic deltas from the batch operator, both forced by the
  * streaming model, both part of the contract:
  *
  *  - Keeper = FIRST ARRIVAL, not min-id: a stream cannot elect the
  *    minimum of a group it hasn't finished seeing. Batch re-curation
  *    (c70) remains the authority for deterministic min-id election.
  *  - State must be BOUNDED. Unbounded exact dedup state is O(distinct
  *    keys) forever — at 100 TB that is the whole corpus keyed by hash in
  *    the state store. The production operator therefore bounds state
  *    with a watermark: duplicates arriving within `delay` of the
  *    keeper's event time are dropped, the key's state is evicted once
  *    the watermark passes, and a duplicate arriving AFTER eviction is
  *    re-admitted. That horizon/catch-up split (stream dedups the
  *    near-in-time copies — crawler retries, republications; a periodic
  *    batch d40 sweep catches the long tail) is the standard ingest
  *    design, and the spec pins all three behaviors.
  */
object StreamDedup {

  /** Unbounded exact dedup on a content hash: first arrival of each
    * content survives. State is O(distinct keys) with NO eviction — use
    * only for bounded replays; production streams use
    * [[exactWithinWatermark]].
    */
  def exactUnbounded(docs: DataFrame, content: Column): DataFrame =
    docs.withColumn("__content_hash", md5(content))
      .dropDuplicates("__content_hash")
      .drop("__content_hash")

  /** Watermark-bounded exact dedup: duplicates within `delay` of the
    * keeper's `eventTime` are dropped; the key's state is evicted once
    * the watermark passes, after which the same content is re-admitted.
    */
  def exactWithinWatermark(docs: DataFrame, content: Column,
                           eventTime: String, delay: String): DataFrame =
    docs.withColumn("__content_hash", md5(content))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
