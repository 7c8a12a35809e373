package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

import graft.operators.Dedup

/** One banded arrival routed to its (band, bucket) state key; `sig` is
  * the doc's FULL 32-slot minhash signature (carrying it beats rejoin
  * stages, exactly as the batch band join does).
  */
final case class BandArrival(band: Int, bucket: String, doc_id: Long, sig: Array[Long])

/** A doc held in a bucket's index. */
final case class IndexedSig(doc_id: Long, sig: Array[Long])

/** d42's output row, streamed. */
final case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

/** Streaming MinHash-LSH near-dup — the fuzzy sibling of [[StreamDedup]]
  * and the streaming form of the batch d42/d63 band index
  * ([[graft.operators.Dedup.minhashNearDupPairsFrom]] /
  * `incrementalNeardupClusters`): each arriving document is shingled,
  * minhashed, and banded ONCE (the narrow
  * [[graft.operators.Dedup.streamBandedSignaturesFrom]] projection — no
  * aggregate in front of the state operator), its 8 band rows route to
  * per-(band, bucket) keyed state holding the bucket's earlier
  * signatures, and candidate near-dup pairs are emitted the moment the
  * LATER document arrives — the d63 advance discipline, at micro-batch
  * granularity.
  *
  * Exactly-once pair emission WITHOUT a downstream dedup: two docs can
  * collide in several bands, and a streaming plan cannot re-group the
  * whole pair stream the way batch d42's groupBy(doc_a, doc_b) does.
  * Instead each bucket's processor emits a pair only if ITS band is the
  * pair's FIRST colliding band — a pure function of the two full
  * signatures both sides already hold (band-slice equality ⇔ band-digest
  * equality, the batch join's own md5-injectivity assumption), so every
  * colliding pair is emitted exactly once globally, with zero extra
  * state. The estimate filter (matching-slot fraction ≥ threshold) runs
  * in the processor too, with the exact batch rounding.
  *
  * Contracts (StreamNearDupSpec pins all three):
  *  - stream ≡ batch: over a full replay with no TTL, the emitted pair
  *    set equals d42's (doc_a, doc_b, est_jaccard) set exactly;
  *  - re-delivery idempotence: a doc_id already indexed in a bucket is
  *    never re-compared or re-indexed;
  *  - bounded state: `ttl` evicts idle buckets (processing-time TTL, the
  *    [[graft.fidelity.StatefulStats]] hygiene) — the horizon/catch-up
  *    split of [[StreamDedup]]: the stream catches near-in-time
  *    near-dups, the periodic batch d42/d45 sweep owns the long tail.
  *
  * Scale shape: state per key is the bucket's (doc_id, 32-long sig)
  * list — the corpus-orders-smaller band index of d63, sharded by
  * (band, bucket) across the cluster; per-arrival work is
  * O(bucket-mates). `maxBucket` is the [[graft.operators.BucketGuard]]
  * runaway brake, and a binding cap FAILS THE QUERY (ADVICE r14): a
  * capped bucket cannot silently skip indexing, because a pair whose
  * FIRST colliding band routed to the capped bucket is owned by that
  * band alone — every other band deliberately skips it, so skip-at-cap
  * would lose the pair globally, silently diverging from batch d42.
  * That is exactly the divergence class the batch incremental path
  * fails loudly on (`Dedup.incrementalNeardupClusters`'s require), so
  * the stream does the same: raise the cap, or collapse the degenerate
  * exact-identical docs with [[StreamDedup]] upstream and route the
  * long tail to the periodic batch sweep.
  */
class NearDupIndexProcessor(threshold: Double, maxBucket: Int,
                            ttl: Option[java.time.Duration] = None)
    extends StatefulProcessor[(Int, String), BandArrival, NearDupPair] {

  @transient private var members: ListState[IndexedSig] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[IndexedSig]("members",
      Encoders.product[IndexedSig],
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  /** First band whose 4-slot slice matches — the pair's unique emitting
    * band. Always ≤ the caller's band for pairs delivered to it (slice
    * equality at the caller's band is what routed both docs here).
    */
  private def firstCollidingBand(a: Array[Long], b: Array[Long]): Int = {
    var band = 0
    while (band < Dedup.NumBands) {
      var i = band * Dedup.RowsPerBand
      var eq = true
      while (eq && i < (band + 1) * Dedup.RowsPerBand) {
        eq = a(i) == b(i); i += 1
      }
      if (eq) return band
      band += 1
    }
    -1 // unreachable for rows a band-bucket key delivered
  }

  /** Matching-slot fraction, rounded exactly as the batch expression
    * (`round(matches / 32.0, 6)` — Spark's HALF_UP double rounding).
    */
  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var m = 0; var i = 0
    while (i < Dedup.NumHashes) { if (a(i) == b(i)) m += 1; i += 1 }
    BigDecimal(m.toDouble / Dedup.NumHashes)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override def handleInputRows(key: (Int, String), rows: Iterator[BandArrival],
                               timerValues: TimerValues): Iterator[NearDupPair] = {
    val band = key._1
    var held = members.get().toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
    rows.toSeq.sortBy(_.doc_id).foreach { r =>
      if (!held.exists(_.doc_id == r.doc_id)) {
        // fail-stop at the cap (never skip): an unindexed doc's
        // first-colliding-band pairs would be lost in EVERY band — the
        // silent stream≠batch divergence the batch fold's require
        // forbids (see class doc)
        if (held.length >= maxBucket)
          throw new IllegalStateException(
            s"streaming near-dup: band-bucket cap $maxBucket binds at (band=$band, " +
              s"bucket=${key._2}); a binding cap breaks stream ≡ batch d42 — raise " +
              "the cap or collapse exact-identical docs upstream (StreamDedup)")
        held.foreach { m =>
          if (firstCollidingBand(m.sig, r.sig) == band) {
            val est = estJaccard(m.sig, r.sig)
            if (est >= threshold)
              out += NearDupPair(math.min(m.doc_id, r.doc_id),
                math.max(m.doc_id, r.doc_id), est)
          }
        }
        val n = IndexedSig(r.doc_id, r.sig)
        held = held :+ n
        members.appendValue(n)
      }
    }
    out.iterator
  }
}

/** Incremental connected-components maintenance over streamed near-dup
  * pairs (VERDICT r14 item 3): [[StreamNearDup]] emits raw candidate
  * pairs, but a dedup consumer wants CLUSTER LABELS — and re-running the
  * batch resolver from scratch per micro-batch re-pays the whole
  * accumulated pair list's log-diameter loop every trigger. This folds
  * instead: per micro-batch, connected components run over the CURRENT
  * labeling's star edges (star contraction preserves connectivity —
  * [[graft.operators.Curation.advance]]'s cluster discipline) plus the
  * batch's new pairs, so each fold's loop converges on the DELTA's
  * cluster merges while the carried state stays one star edge per
  * non-root node. Folded labels ≡ a from-scratch resolution over every
  * pair seen (StreamNearDupSpec pins it across 3 micro-batches).
  *
  * Scale shape: state is node-sized (near-dup members only), the fold is
  * driver-coordinated but fully distributed (the same pointer-jumping
  * joins as d45), and [[graft.operators.Checkpoints.fresh]] keeps
  * lineage O(1) across micro-batches. Attach via [[attach]]
  * (foreachBatch) or call [[fold]] from an existing foreachBatch sink.
  */
class NearDupClusterMaintainer(spark: SparkSession) {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  @volatile private var state: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("cluster_id", LongType))))

  /** The current (doc_id, cluster_id) labeling — min id per component,
    * exactly d45's shape over the pairs folded so far.
    */
  def labels: DataFrame = state

  /** Fold one micro-batch of (doc_a, doc_b, ...) pairs; returns the
    * updated labels. Synchronized: micro-batches arrive sequentially
    * per query, but the label reader may race a fold.
    */
  def fold(pairs: DataFrame): DataFrame = synchronized {
    val star = state.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
    val merged = Dedup.connectedComponents(
      star.unionByName(pairs.select(col("doc_a"), col("doc_b"))), "doc_a", "doc_b")
    state = graft.operators.Checkpoints.fresh(merged, "doc_id", "cluster_id")
    state
  }

  /** The maintainer as a foreachBatch sink over [[StreamNearDup]]'s
    * output (caller sets trigger/checkpoint options and starts it).
    */
  def attach(pairs: Dataset[NearDupPair]): org.apache.spark.sql.streaming.DataStreamWriter[NearDupPair] =
    pairs.writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[NearDupPair], _: Long) => fold(batch.toDF()); () }
}

object StreamNearDup {

  /** Streaming (doc_id, text) frame → near-dup candidate pairs, emitted
    * once each when the pair's later member arrives. No TTL (default)
    * replays to exactly d42's pair set; with `ttl`, idle buckets evict
    * and the long tail belongs to the periodic batch sweep.
    */
  def apply(docs: DataFrame, threshold: Double = 0.35,
            maxBucket: Int = Dedup.DocBucketCap,
            ttl: Option[java.time.Duration] = None): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    Dedup.streamBandedSignaturesFrom(docs)
      .select(col("band").cast("int").as("band"), col("bucket"),
        col("doc_id"), col("sig"))
      .as[BandArrival]
      .groupByKey(r => (r.band, r.bucket))
      .transformWithState(new NearDupIndexProcessor(threshold, maxBucket, ttl),
        mode, OutputMode.Update())
  }
}
