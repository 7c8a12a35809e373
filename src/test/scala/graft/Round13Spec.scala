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

  // ------------------------------------------ q141 Anderson-Darling (2-s)
  private def adFrame(rows: Seq[(String, Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("grp", "cents", "is_a")
  }

  /** Naive Pettitt/Scholz-Stephens k=2 A² over one group's values. */
  private def naiveAd(rows: Seq[(Long, Long)]): Double = {
    // rows: (cents, is_a) one per observation
    val na = rows.count(_._2 == 1L).toDouble
    val nb = rows.size - na
    val nn = rows.size.toDouble
    val grid = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var cumA = 0.0; var cumB = 0.0; var sum = 0.0
    for ((_, obs) <- grid) {
      val l = obs.size.toDouble
      cumA += obs.count(_._2 == 1L); cumB += obs.count(_._2 == 0L)
      val j = cumA + cumB
      if (j < nn) {
        val d = cumA * nb - cumB * na
        sum += math.floor(l * d * d / (j * (nn - j)) * 1e3 + 0.5)
      }
    }
    math.rint(sum / 1e3 / (na * nb) * 1e6) / 1e6
  }

  test("q141: identical per-value counts give A2 = 0; naive recompute matches") {
    val same = (1L to 40L).flatMap(v => Seq(("g", v * 7, 1L), ("g", v * 7, 0L)))
    val r0 = graft.operators.Audits.andersonDarlingFrom(adFrame(same)).head()
    assert(r0.getDouble(3) == 0.0, "identical distributions must give A2 = 0")
    // interleaved-but-shifted mixture: nontrivial ties, both tails used
    val mixed = (1L to 60L).map(i => ("g", (i * 13) % 47, if (i % 3 == 0) 1L else 0L)) ++
      (1L to 25L).map(i => ("g", 40L + (i * 5) % 30, 1L))
    val got = graft.operators.Audits.andersonDarlingFrom(adFrame(mixed)).head()
    val want = naiveAd(mixed.map(r => (r._2, r._3)))
    assert(got.getDouble(3) == want, s"naive A2 $want vs engine ${got.getDouble(3)}")
    // disjoint supports: AD must register a large statistic
    val disj = (1L to 30L).map(i => ("g", i, 1L)) ++ (1L to 30L).map(i => ("g", 1000L + i, 0L))
    val big = graft.operators.Audits.andersonDarlingFrom(adFrame(disj)).head()
    assert(big.getDouble(3) > 10.0, s"disjoint supports must blow up AD, got ${big.getDouble(3)}")
  }

  // ----------------------------------------------------- q143 effect sizes
  test("q143: planted shift gives delta = 1 and the closed-form Cohen's d") {
    val a = Seq(100000L, 200000L, 300000L, 400000L)
    val shifted = a.map(v => ("g", v, 1L)) ++ a.map(v => ("g", v - 50000000L, 0L))
    val r = graft.operators.Audits.effectSizesFrom(adFrame(shifted)).head()
    assert(r.getDouble(4) == 1.0, "every a above every b must give delta = +1")
    // equal shapes => pooled sd = sample sd; d = shift / sd exactly
    val n = a.size.toDouble
    val mean = a.sum.toDouble / n
    val sd = math.sqrt(a.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    val want = math.rint(5.0e7 / sd * 1e6) / 1e6
    assert(r.getDouble(3) == want, s"closed-form d $want vs engine ${r.getDouble(3)}")
    // symmetric swap flips both signs
    val sw = graft.operators.Audits.effectSizesFrom(
      adFrame(shifted.map { case (g, v, f) => (g, v, 1L - f) })).head()
    assert(sw.getDouble(4) == -1.0 && sw.getDouble(3) == -want)
    // degenerate: n_a = 1 guards d to NULL but delta still computes
    val one = Seq(("g", 5L, 1L), ("g", 1L, 0L), ("g", 2L, 0L))
    val g1 = graft.operators.Audits.effectSizesFrom(adFrame(one)).head()
    assert(g1.isNullAt(3), "n_a < 2 must guard Cohen's d")
    assert(g1.getDouble(4) == 1.0)
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
