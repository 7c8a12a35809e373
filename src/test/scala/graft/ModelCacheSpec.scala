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
