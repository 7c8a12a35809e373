package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Round-13 additions: the ADVICE r12 degenerate-class guards and the
  * ModelCache frozen-model / storage-hygiene semantics.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  // ---------------------------------------------------------- ModelCache
  test("ModelCache: second memo call is a cache hit and survives the transient sweep") {
    val s = spark; import s.implicits._
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def build = { built.incrementAndGet(); Seq(1, 2, 3).toDF("x") }
    val m1 = ModelCache.memo(spark, "spec_model", "spec_dir")(build)
    // an unshielded transient checkpoint, as an operator would take one
    Seq(4, 5).toDF("y").localCheckpoint(true)
    ModelCache.releaseTransient(spark)
    // shielded frame still readable after the sweep; no rebuild happened
    val m2 = ModelCache.memo(spark, "spec_model", "spec_dir")(build)
    assert(m1.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    assert(m2.collect().length == 3)
    assert(built.get() == 1, s"expected exactly one build, got ${built.get()}")
  }

  // ------------------------------------------------- t86 degenerate guard
  test("t86 guards: all-pass frame nulls fpr+auc, all-fail frame nulls tpr+auc") {
    val s = spark; import s.implicits._
    def frame(ps: Seq[(Long, Int)]) = ps.toDF("score_n9", "pass")
    // n_neg = 0: TPR is still a real operating point, FPR and AUC are not
    val allPass = TextOps.rocAucFrom(frame((1 to 40).map(i => (i + 1000L, 1)))).collect()
    assert(allPass.forall(r => !r.isNullAt(2)), "tpr must compute with n_pos > 0")
    assert(allPass.forall(r => r.isNullAt(3) && r.isNullAt(4)),
      "fpr and auc must be guarded NULL with n_neg = 0")
    // n_pos = 0: FPR real, TPR and AUC guarded
    val allFail = TextOps.rocAucFrom(frame((1 to 40).map(i => (i + 1000L, 0)))).collect()
    assert(allFail.forall(r => r.isNullAt(2) && r.isNullAt(4)),
      "tpr and auc must be guarded NULL with n_pos = 0")
    assert(allFail.forall(r => !r.isNullAt(3)), "fpr must compute with n_neg > 0")
  }

  // --------------------------------------------- d63 incremental near-dup
  test("d63: 2- and 3-batch incremental folds equal the from-scratch d45 clustering") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val want = graft.operators.Dedup.d45NearDupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    for (k <- Seq(2, 3)) {
      val cuts = (1 to k).map(i => mx * i / k)
      val batches = (-1L +: cuts.dropRight(1).map(_.toLong)).zip(cuts).map {
        case (lo, hi) => docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
      }
      val got = graft.operators.Dedup.incrementalNeardupClusters(batches)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want, s"$k-batch fold diverged from the from-scratch clustering")
    }
  }

  // ------------------------------------------------- t88 degenerate guard
  test("t88 guard: n_pos = 0 yields NULL ap, zero prevalence") {
    val s = spark; import s.implicits._
    val r = TextOps.averagePrecisionFrom(
      (1L to 30L).map(i => (i + 1000L, 0L)).toDF("score_n9", "pass")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 30L)
    assert(r.getDouble(2) == 0.0, "prevalence is an exact 0")
    assert(r.isNullAt(3), "ap must be guarded NULL with no positive class")
  }
}
