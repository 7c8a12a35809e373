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

  // --------------------------------------------------- t94 Cochran's Q
  test("t94: naive recompute matches; all-agree corpus guards Q to NULL") {
    val s = spark; import s.implicits._
    def q(rows: Seq[(String, Long, Long, Long)]) =
      TextOps.cochranQFrom(rows.toDF("source", "pass", "keep", "uniq")).collect()
    // planted disagreement: gate columns with different margins
    val rows = (1 to 40).map { i =>
      ("s", (i % 2).toLong, (i % 3 min 1).toLong, if (i <= 10) 1L else 0L)
    }
    val got = q(rows).head
    // naive within-subject Q
    val k = 3.0
    val g = Seq(rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum).map(_.toDouble)
    val ls = rows.map(r => r._2 + r._3 + r._4)
    val t = ls.sum.toDouble
    val den = k * t - ls.map(l => l * l).sum
    val want = math.rint((k - 1.0) * (k * g.map(x => x * x).sum - t * t) / den * 1e6) / 1e6
    assert(got.getDouble(5) == want, s"naive Q $want vs engine ${got.getDouble(5)}")
    // every doc passes all three gates or none: denominator 0, guarded
    val agree = (1 to 20).map(i => ("s", (i % 2).toLong, (i % 2).toLong, (i % 2).toLong))
    assert(q(agree).head.isNullAt(5), "all-agree corpus must guard Q to NULL")
    // identical margins with disagreement: Q = 0 exactly
    val perm = Seq(("s", 1L, 0L, 0L), ("s", 0L, 1L, 0L), ("s", 0L, 0L, 1L))
    assert(q(perm).head.getDouble(5) == 0.0, "rotated flags have equal margins, Q = 0")
  }

  // ----------------------------------------------------------- q142 CCF
  private def dayOf(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(i))

  test("q142: self-series gives ccf(0) = 1 with symmetric lags; shifted series peaks at the shift") {
    val s = spark; import s.implicits._
    val xs = (0 until 80).map(i => (dayOf(i), ((i * 37) % 11 + 1) * 100L))
    val self = xs.map { case (d, v) => (d, v, v) }.toDF("day", "x_c", "y_c")
    val r = graft.operators.Temporal.ccfFrom(self).collect()
      .map(row => row.getLong(0) -> row.getDouble(2)).toMap
    assert(r(0L) == 1.0, s"self-correlation at lag 0 must be 1, got ${r(0L)}")
    for (k <- 1L to 7L)
      assert(r(k) == r(-k), s"self-series CCF must be symmetric at lag $k")
    // y_t = x_{t-3}: y repeats x three days later, so corr(x_t, y_{t+3})
    // pairs identical values — the CCF peaks at lag +3 ("x leads y")
    val shifted = (3 until 80).map(i => (dayOf(i), xs(i)._2, xs(i - 3)._2))
      .toDF("day", "x_c", "y_c")
    val p = graft.operators.Temporal.ccfFrom(shifted).collect()
      .map(row => row.getLong(0) -> row.getDouble(2)).toMap
    assert(p(3L) == p.values.max && p(3L) > 0.9,
      s"y = x shifted +3 must peak at lag +3, got ${p(3L)} (max ${p.values.max})")
  }

  // ------------------------------------------------- q144 Dickey-Fuller
  test("q144: naive recompute matches; white noise rejects the unit root, a walk does not") {
    val s = spark; import s.implicits._
    def tau(vs: Seq[Long]): (Double, Boolean, Double) = {
      val df = vs.zipWithIndex.map { case (v, i) => ("g", dayOf(i), v) }
        .toDF("grp", "day", "rev_c")
      val r = graft.operators.Temporal.dickeyFullerFrom(df).head()
      (r.getDouble(2), r.isNullAt(3), if (r.isNullAt(3)) 0.0 else r.getDouble(3))
    }
    // seeded noise: deterministic, serially uncorrelated
    val rng = new scala.util.Random(7)
    val noise = (0 until 120).map(_ => 500L + rng.nextInt(1000))
    // naive OLS recompute of gamma and tau
    val pairs = noise.sliding(2).map(w => (w(0).toDouble, (w(1) - w(0)).toDouble)).toSeq
    val np = pairs.size.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val (vx, vy, nm) = (sxx * np - sx * sx, syy * np - sy * sy, sxy * np - sx * sy)
    val wantG = math.rint(nm / vx * 1e9) / 1e9
    val wantT = math.rint(nm * math.sqrt(np - 2) / math.sqrt(vy * vx - nm * nm) * 1e6) / 1e6
    val (g, _, t) = tau(noise)
    assert(g == wantG && t == wantT, s"naive ($wantG, $wantT) vs engine ($g, $t)")
    assert(t < -5.0, s"white noise must reject the unit root decisively, tau $t")
    // random walk: cumulative sum of centered seeded increments
    val rng2 = new scala.util.Random(11)
    val walk = (0 until 120).map(_ => rng2.nextInt(1001) - 500L)
      .scanLeft(100000L)(_ + _).tail
    val (_, _, tw) = tau(walk)
    assert(tw > -2.86, s"a random walk must not beat the 5% DF bar, tau $tw")
    // exact doubling: dx = x_{t-1} fits perfectly — gamma = 1 exactly,
    // ss = 0, tau guarded NULL (the t86/t88 convention)
    val (gg, nullT, _) = tau((0 until 30).map(i => 1000L << i))
    assert(gg == 1.0 && nullT, s"perfect fit must give gamma 1 and NULL tau, got ($gg, $nullT)")
  }

  // ------------------------------------------------- q145 Granger causality
  test("q145: a planted x->y chain is detected in one direction only; naive recompute matches") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(13)
    val x = (0 until 150).map(_ => 10000L + rng.nextInt(5000))
    // y follows yesterday's x plus independent noise: x causes y
    val y = (0 until 150).map(i =>
      (if (i == 0) 12000L else x(i - 1)) + rng.nextInt(500))
    val daily = (0 until 150).map(i => (dayOf(i), x(i), y(i))).toDF("day", "x_c", "y_c")
    val r = graft.operators.Temporal.grangerFrom(daily).collect()
      .map(row => row.getString(0) -> row).toMap
    val fXtoY = r("x_to_y").getDouble(4)
    val fYtoX = r("y_to_x").getDouble(4)
    assert(fXtoY > 50.0 && fYtoX < 10.0 && fXtoY > 10 * fYtoX,
      s"planted chain must be one-directional: x->y $fXtoY vs y->x $fYtoX")
    // naive recompute of the y_to_x direction over the same pairs
    val trip = (1 until 150).map(i => (x(i).toDouble, x(i - 1).toDouble, y(i - 1).toDouble))
    val np = trip.size.toDouble
    def snap(nm: Double, va: Double, vb: Double) =
      math.floor(nm / (math.sqrt(va) * math.sqrt(vb)) * 1e9 + 0.5) / 1e9
    val (sy, s1, s2) = (trip.map(_._1).sum, trip.map(_._2).sum, trip.map(_._3).sum)
    val vy = trip.map(t => t._1 * t._1).sum * np - sy * sy
    val v1 = trip.map(t => t._2 * t._2).sum * np - s1 * s1
    val v2 = trip.map(t => t._3 * t._3).sum * np - s2 * s2
    val r1y = snap(trip.map(t => t._2 * t._1).sum * np - s1 * sy, v1, vy)
    val r2y = snap(trip.map(t => t._3 * t._1).sum * np - s2 * sy, v2, vy)
    val r12 = snap(trip.map(t => t._2 * t._3).sum * np - s1 * s2, v1, v2)
    val r2u = (r1y * r1y + r2y * r2y - 2.0 * r1y * r2y * r12) / (1.0 - r12 * r12)
    val want = math.rint((np - 3.0) * (r2u - r1y * r1y) / (1.0 - r2u) * 1e6) / 1e6
    assert(fYtoX == want, s"naive F $want vs engine $fYtoX")
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
