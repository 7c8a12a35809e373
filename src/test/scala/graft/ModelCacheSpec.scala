package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ModelCache keying + teardown mechanics (VERDICT r13 item 4 / ADVICE
  * r13 item 4): the memo must be keyed by the battery-varying config
  * fingerprint and by the owning application, and `releaseAll` must
  * forget an application's entries so the shielded set cannot grow
  * monotonically across sessions. The KN-path consequences (t77
  * sum-mode invariance, t77/t78 run-order independence) are pinned in
  * Round14Spec; Round13Spec pins the memo-hit + transient-sweep basics.
  */
class ModelCacheSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  // --------------------------------------------------- ModelCache keying
  test("ModelCache: memo is keyed by the sum-mode fingerprint") {
    val s = spark; import s.implicits._
    val built = new AtomicInteger(0)
    def build = { built.incrementAndGet(); Seq(1, 2, 3).toDF("x") }
    ModelCache.memo(spark, "r14_mode_key", "d")(build)
    assert(built.get() == 1)
    sys.props("graft.sums") = "decimal"
    try {
      // other mode → other key → fresh build, never a stale frame
      ModelCache.memo(spark, "r14_mode_key", "d")(build)
      assert(built.get() == 2, "mode switch must rebuild, not serve stale")
      ModelCache.memo(spark, "r14_mode_key", "d")(build)
      assert(built.get() == 2, "same mode again is a cache hit")
    } finally { sys.props.remove("graft.sums"); () }
    ModelCache.memo(spark, "r14_mode_key", "d")(build)
    assert(built.get() == 2, "original mode's frame survives the switch")
  }

  test("ModelCache: releaseTransient prunes entries of other (dead) applications") {
    val s = spark; import s.implicits._
    // plant an entry under a fabricated dead appId by temporarily
    // reaching the private maps through the real API: memo under the
    // live app, then verify the sweep keeps live entries and drops the
    // planted dead-app ones (ADVICE r14: a crashed harness that never
    // called releaseAll must not leak for the JVM's life)
    ModelCache.memo(spark, "r15_live", "d")(Seq(1).toDF("x"))
    val live = spark.sparkContext.applicationId
    assert(ModelCache.entryCountFor(live) >= 1)
    ModelCache.plantDeadEntryForTest("app-dead-r15", Seq(2).toDF("x"))
    assert(ModelCache.entryCountFor("app-dead-r15") == 1)
    ModelCache.releaseTransient(spark)
    assert(ModelCache.entryCountFor("app-dead-r15") == 0,
      "sweep must prune dead-app entries")
    assert(ModelCache.entryCountFor(live) >= 1,
      "sweep must keep the live app's entries")
  }

  test("ModelCache: releaseAll clears memo entries and rebuilds on next use") {
    val s = spark; import s.implicits._
    val built = new AtomicInteger(0)
    def build = { built.incrementAndGet(); Seq(1, 2).toDF("x") }
    ModelCache.memo(spark, "r14_release", "d")(build)
    ModelCache.memo(spark, "r14_release", "d")(build)
    assert(built.get() == 1)
    ModelCache.releaseAll(spark)
    val again = ModelCache.memo(spark, "r14_release", "d")(build)
    assert(built.get() == 2, "releaseAll must forget the memo entry")
    assert(again.collect().length == 2, "rebuilt frame must be readable")
  }

}
