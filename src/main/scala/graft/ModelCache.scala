package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Checkpoints.GraftCheckpointOps

/** Session-scoped frozen-model cache + battery storage hygiene.
  *
  * Two problems, one mechanism:
  *
  * 1. '''Frozen models.''' Several queries consume the same small derived
  *    model frame (t77's gate and t78's CCNet bucketing both read the KN
  *    bigram doc-score frame). In a real pipeline the model is fit ONCE
  *    and every consumer reads the frozen artifact — [[memo]] is that
  *    idiom: the first caller materializes the frame via an eager
  *    `localCheckpoint`, later callers (same application, same input dir,
  *    same config fingerprint) reuse the truncated-lineage frame. Only
  *    node-bounded frames belong here (the KN score frame is |docs| rows
  *    of 4 scalars); corpus-sized intermediates must stay transient.
  *
  * 2. '''Battery hygiene.''' The operators eagerly `localCheckpoint`
  *    corpus-sized intermediates where boundary determinism or multi-
  *    consumer reuse demands it. Checkpointed blocks stay pinned in
  *    executor storage until driver GC — across a 248-query battery
  *    (plus its warm-up replay) hundreds of pinned block sets accumulate
  *    in one JVM and degrade the tail of the run (round 12 measured
  *    t78 at 67 s in-battery vs 5.5 s solo, same code). The harnesses
  *    ([[Bench]], [[Verify]]) call [[releaseTransient]] after each
  *    query: every persistent RDD NOT protected by [[memo]] is dropped.
  *    Unpersisting a checkpointed RDD discards its (lineage-truncated)
  *    data for good, which is exactly why memoized frames — the only
  *    checkpoints referenced across query boundaries — are exempted.
  *    At session teardown the harnesses call [[releaseAll]], so the
  *    shielded set cannot grow monotonically across sessions.
  *
  * Keying (VERDICT/ADVICE r13): memo entries are keyed by
  * '''(applicationId, config fingerprint, key, dir)''', not (key, dir):
  *
  *  - `applicationId` — a second SparkSession created in the same JVM
  *    after the first stops must never be served a DataFrame bound to
  *    the dead session; RDD ids also restart from 0 per context, so the
  *    shield set is app-qualified too (a stale id from a previous app
  *    must not shield an unrelated new RDD from [[releaseTransient]]).
  *  - config fingerprint — any session config that varies across gate
  *    batteries (today: the [[graft.operators.Relational.sumMode]]
  *    switch) keys the memo, so "memoized frames must be
  *    config-invariant" is no longer an unenforced discipline: a
  *    config-dependent build gets a fresh frame per mode by
  *    construction. ModelCacheSpec additionally pins that today's one
  *    memo user (the KN doc-score frame) IS mode-invariant.
  */
object ModelCache {
  private val frames = TrieMap.empty[(String, String, String, String), DataFrame]
  private val shielded = TrieMap.empty[(String, Int), Unit]

  private def appId(spark: SparkSession): String = spark.sparkContext.applicationId

  /** The battery-varying config folded into every memo key. */
  private def fingerprint: String = graft.operators.Relational.sumMode

  /** Build-once memo: first call evaluates `build`, freezes the result
    * with an eager `localCheckpoint`, and shields the checkpoint's
    * blocks from [[releaseTransient]]; later calls with the same
    * (application, fingerprint, key, dir) return the frozen frame.
    * Single-threaded driver use (harnesses run queries sequentially); a
    * rare double-build under concurrent first calls is benign — both
    * results are correct, one extra shielded frame stays resident.
    */
  def memo(spark: SparkSession, key: String, dir: String)(build: => DataFrame): DataFrame = {
    val k = (appId(spark), fingerprint, key, dir)
    frames.getOrElse(k, {
      // evaluate first: any checkpoints `build` takes internally are
      // transient scaffolding and must NOT land in the shielded set
      val df = build
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val frozen = df.graftCheckpoint(true)
      spark.sparkContext.getPersistentRDDs.keySet.diff(before)
        .foreach(id => shielded.put((k._1, id), ()))
      frames.putIfAbsent(k, frozen)
      frozen
    })
  }

  /** Drop every persistent RDD the [[memo]] shield does not cover —
    * the between-queries sweep for battery harnesses. Non-blocking:
    * block removal proceeds while the next query plans.
    *
    * Also prunes map entries belonging to OTHER applicationIds
    * (ADVICE r14): only one SparkContext is active per JVM, so any
    * other appId in the maps is a dead session whose harness crashed
    * past its [[releaseAll]] — its DataFrames are unusable and its
    * blocks died with the context; keeping the entries would leak for
    * the JVM's life.
    */
  def releaseTransient(spark: SparkSession): Unit = {
    val app = appId(spark)
    shielded.keys.filter(_._1 != app).foreach(shielded.remove)
    frames.keys.filter(_._1 != app).foreach(frames.remove)
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!shielded.contains((app, id))) rdd.unpersist(blocking = false)
    }
  }

  /** Test hook: memo entries held for an applicationId. */
  private[graft] def entryCountFor(app: String): Int =
    frames.keys.count(_._1 == app)

  /** Test hook: plant an entry under a fabricated (dead) appId so the
    * sweep's pruning is observable without a second SparkContext.
    */
  private[graft] def plantDeadEntryForTest(app: String, df: DataFrame): Unit = {
    frames.put((app, fingerprint, "planted", "d"), df)
    shielded.put((app, Int.MaxValue), ())
  }

  /** Session teardown: unpersist every shielded frame of THIS
    * application and forget its memo entries. Harness mains call this
    * before `spark.stop()`; spec suites that share one JVM across
    * SparkSessions call it between sessions.
    */
  def releaseAll(spark: SparkSession): Unit = {
    val app = appId(spark)
    val persistent = spark.sparkContext.getPersistentRDDs
    shielded.keys.filter(_._1 == app).foreach { k =>
      persistent.get(k._2).foreach(_.unpersist(blocking = false))
      shielded.remove(k)
    }
    frames.keys.filter(_._1 == app).foreach(frames.remove)
  }
}
