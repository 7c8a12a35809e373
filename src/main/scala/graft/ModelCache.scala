package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped frozen-model cache + battery storage hygiene.
  *
  * Two problems, one mechanism:
  *
  * 1. '''Frozen models.''' Several queries consume the same small derived
  *    model frame (t77's gate and t78's CCNet bucketing both read the KN
  *    bigram doc-score frame). In a real pipeline the model is fit ONCE
  *    and every consumer reads the frozen artifact — [[memo]] is that
  *    idiom: the first caller materializes the frame via an eager
  *    `localCheckpoint`, later callers (same JVM, same input dir) reuse
  *    the truncated-lineage frame. Only node-bounded frames belong here
  *    (the KN score frame is |docs| rows of 4 scalars); corpus-sized
  *    intermediates must stay transient.
  *
  * 2. '''Battery hygiene.''' The operators eagerly `localCheckpoint`
  *    corpus-sized intermediates where boundary determinism or multi-
  *    consumer reuse demands it. Checkpointed blocks stay pinned in
  *    executor storage until driver GC — across a 233-query battery
  *    (plus its warm-up replay) hundreds of pinned block sets accumulate
  *    in one JVM and degrade the tail of the run (round 12 measured
  *    t78 at 67 s in-battery vs 5.5 s solo, same code). The harnesses
  *    ([[Bench]], [[Verify]]) call [[releaseTransient]] after each
  *    query: every persistent RDD NOT protected by [[memo]] is dropped.
  *    Unpersisting a checkpointed RDD discards its (lineage-truncated)
  *    data for good, which is exactly why memoized frames — the only
  *    checkpoints referenced across query boundaries — are exempted.
  */
object ModelCache {
  private val frames = TrieMap.empty[(String, String), DataFrame]
  private val shielded = TrieMap.empty[Int, Unit]

  /** Build-once memo: first call evaluates `build`, freezes the result
    * with an eager `localCheckpoint`, and shields the checkpoint's
    * blocks from [[releaseTransient]]; later calls with the same
    * (key, dir) return the frozen frame. Single-threaded driver use
    * (harnesses run queries sequentially); a rare double-build under
    * concurrent first calls is benign — both results are correct, one
    * extra shielded frame stays resident.
    */
  def memo(spark: SparkSession, key: String, dir: String)(build: => DataFrame): DataFrame =
    frames.getOrElse((key, dir), {
      // evaluate first: any checkpoints `build` takes internally are
      // transient scaffolding and must NOT land in the shielded set
      val df = build
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val frozen = df.localCheckpoint(true)
      spark.sparkContext.getPersistentRDDs.keySet.diff(before)
        .foreach(id => shielded.put(id, ()))
      frames.putIfAbsent((key, dir), frozen)
      frozen
    })

  /** Drop every persistent RDD the [[memo]] shield does not cover —
    * the between-queries sweep for battery harnesses. Non-blocking:
    * block removal proceeds while the next query plans.
    */
  def releaseTransient(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!shielded.contains(id)) rdd.unpersist(blocking = false)
    }
}
