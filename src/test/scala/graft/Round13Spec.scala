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

  // --------------------------------------------------- t95 readability
  test("t95: closed-form counts on a constructed doc; no-sentence doc guards NULL") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "the cat sat on a mat. it was happy! was it?"),
      (2L, "no terminator here at all")).toDF("doc_id", "text")
    val r = TextOps.readabilityFrom(df).orderBy("doc_id").collect()
    // doc 1: 11 words, 3 sentences, vowel groups counted by hand:
    // the(1) cat(1) sat(1) on(1) a(1) mat.(1) it(1) was(1) happy!(2) was(1) it?(1) = 12
    assert(r(0).getLong(1) == 11L && r(0).getLong(2) == 3L && r(0).getLong(3) == 12L,
      s"counts ${r(0)}")
    val wps = 11.0 / 3.0; val spw = 12.0 / 11.0
    val ease = math.rint((206.835 - 1.015 * wps - 84.6 * spw) * 1e6) / 1e6
    val grade = math.rint((0.39 * wps + 11.8 * spw - 15.59) * 1e6) / 1e6
    assert(r(0).getDouble(4) == ease && r(0).getDouble(5) == grade)
    assert(r(1).isNullAt(4) && r(1).isNullAt(5), "no sentence terminator must guard NULL")
  }

  // ------------------------------------------------------- q146 KPSS
  test("q146: stationary noise stays under the 5% bar, a random walk blows past it; naive recompute matches") {
    val s = spark; import s.implicits._
    def eta(vs: Seq[Long]): Double = {
      val df = vs.zipWithIndex.map { case (v, i) => ("g", dayOf(i), v) }
        .toDF("grp", "day", "rev_c")
      graft.operators.Temporal.kpssFrom(df).head().getDouble(2)
    }
    val rng = new scala.util.Random(23)
    val noise = (0 until 200).map(_ => 5000L + rng.nextInt(2000))
    val en = eta(noise)
    assert(en < 0.463, s"stationary noise must not reject level-stationarity, eta $en")
    // a trending level is the textbook level-nonstationarity — and is
    // deterministic, unlike a seeded walk whose eta varies wildly by path
    val ramp = (1 to 200).map(i => 1000L * i)
    val ew = eta(ramp)
    assert(ew > 0.739, s"a trending level must reject level-stationarity, eta $ew")
    // naive recompute on the noise series (exact integer path mirrored)
    val n = noise.size
    val sSum = noise.sum
    val dv = noise.map(v => n.toLong * v - sSum)
    val p = dv.scanLeft(0L)(_ + _).tail
    val sp2 = p.map(x => BigInt(x) * BigInt(x)).sum
    val g0 = dv.map(x => BigInt(x) * BigInt(x)).sum
    val gw = (1 to 7).map { j =>
      BigInt(8 - j) * (j until n).map(t => BigInt(dv(t)) * BigInt(dv(t - j))).sum
    }.sum
    val lrv8 = BigInt(8) * g0 + BigInt(2) * gw
    val want = math.rint(8.0 * sp2.toDouble / (n.toDouble * lrv8.toDouble) * 1e6) / 1e6
    assert(en == want, s"naive eta $want vs engine $en")
  }

  // -------------------------------------------- q147 Engle-Granger
  test("q147: a cointegrated pair rejects decisively; independent walks do not") {
    val s = spark; import s.implicits._
    def tau(xy: Seq[(Long, Long)]): (Double, Double) = {
      val df = xy.zipWithIndex.map { case ((x, y), i) => (dayOf(i), x, y) }
        .toDF("day", "x_c", "y_c")
      val r = graft.operators.Temporal.engleGrangerFrom(df).head()
      (r.getDouble(1), if (r.isNullAt(4)) 0.0 else r.getDouble(4))
    }
    val rng = new scala.util.Random(31)
    val xw = (0 until 200).map(_ => rng.nextInt(2001) - 1000L)
      .scanLeft(100000L)(_ + _).tail
    // y = 2x + stationary noise: cointegrated with beta ~ 2
    val co = xw.map(x => (x, 2L * x + rng.nextInt(400)))
    val (beta, t1) = tau(co)
    assert(math.abs(beta - 2.0) < 0.01, s"cointegrating beta must be ~2, got $beta")
    assert(t1 < -6.0, s"cointegrated residual must reject the unit root, tau $t1")
    // independent walks: residual is itself a walk, tau must not reject
    val rng2 = new scala.util.Random(37)
    val yw = (0 until 200).map(_ => rng2.nextInt(2001) - 1000L)
      .scanLeft(100000L)(_ + _).tail
    val (_, t2) = tau(xw.zip(yw))
    assert(t2 > -3.4, s"independent walks must not beat the EG 5% bar, tau $t2")
  }

  // --------------------------------------------------- q148 Mood median
  test("q148: identical groups give chi2 = 0; planted shifted group matches the naive table") {
    val s = spark; import s.implicits._
    def mood(rows: Seq[(String, Long)]) =
      graft.operators.Audits.moodMedianFrom(rows.toDF("grp", "cents")).collect()
    // two identical groups: every a_i equals its expectation exactly
    val ident = (1L to 40L).flatMap(v => Seq(("a", v * 10), ("b", v * 10)))
    assert(mood(ident).forall(_.getDouble(4) == 0.0), "identical groups must give chi2 0")
    // planted: group b shifted entirely above the pooled median
    val rows = (1L to 30L).map(v => ("a", v)) ++ (1L to 30L).map(v => ("b", v + 1000L))
    val got = mood(rows)
    // pooled median2 = x_(30) + x_(31) = 30 + 1001; a: 0 above, b: 30 above
    val ga = got.find(_.getString(0) == "a").get
    val gb = got.find(_.getString(0) == "b").get
    assert(ga.getLong(2) == 0L && gb.getLong(2) == 30L, s"above counts $got")
    // naive chi2: a=(0,30), b=(30,0), E=15 everywhere => 4 * 15 = 60
    assert(ga.getDouble(4) == 60.0, s"chi2 must be 60, got ${ga.getDouble(4)}")
  }

  // ------------------------------------------- q149 hypothetical ranks
  test("q149: hypothetical rank functions match the Postgres closed forms") {
    val dir = "/root/testdata/sf0.001"
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("grp"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = graft.operators.Relational.q149HypotheticalRank(spark, dir).collect()
    for (row <- got) {
      val (g, p) = (row.getString(0), row.getLong(1))
      val xs = o.filter(_._1 == g).map(_._2)
      val lt = xs.count(_ < p).toLong
      val dlt = xs.filter(_ < p).distinct.length.toLong
      val le = xs.count(_ <= p).toLong
      assert(row.getLong(3) == lt + 1 && row.getLong(4) == dlt + 1,
        s"rank mismatch at ($g, $p)")
      assert(row.getDouble(5) == math.rint(lt.toDouble / xs.length * 1e6) / 1e6)
      assert(row.getDouble(6) == math.rint((le + 1.0) / (xs.length + 1.0) * 1e6) / 1e6)
    }
  }

  // ----------------------------------------------------- t96 TextRank
  test("t96: naive integer-grid recompute matches; hub word outranks leaves") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "core alpha core beta core gamma"),
      (2L, "alpha beta. core delta"),
      (3L, "gamma delta epsilon core")).toDF("doc_id", "text")
    val got = TextOps.textRankFrom(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // naive: rebuild the same graph and run 5 floor-div rounds
    val toks = Seq("core alpha core beta core gamma", "alpha beta. core delta",
      "gamma delta epsilon core").flatMap { t =>
      val w = t.split(" "); w.init.zip(w.tail)
    }
    val und = toks.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .filter(p => p._1 != p._2).groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val e = und.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }.toSeq
    val wd = e.groupBy(_._1).map { case (k, v) => (k, v.map(_._3).sum) }
    val nodes = wd.keys.toSeq.sorted
    val S = 10000000000L
    var r = nodes.map(n => n -> S / nodes.size).toMap
    for (_ <- 1 to 5) {
      val inflow = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => (r(src) * 85 * w) / (100 * wd(src)) }.sum
      }
      r = nodes.map(n => n -> (S * 15 / (100 * nodes.size) + inflow.getOrElse(n, 0L))).toMap
    }
    val want = r.toSeq.sortBy { case (w, v) => (-v, w) }
    assert(got.toSeq == want, s"naive $want vs engine ${got.toSeq}")
    // 'core' touches every other word and must rank first
    assert(got.head._1 == "core", s"hub must outrank leaves: ${got.head}")
    // rank mass is conserved up to floor loss: never exceeds the grid
    assert(got.map(_._2).sum <= S)
  }

  // -------------------------------------------- q150 Bhattacharyya/Hellinger
  test("q150: identical distributions give BC 1 / H 0, disjoint give BC 0 / H 1; naive recompute matches") {
    def h(rows: Seq[(String, Long, Long)]) =
      graft.operators.Audits.hellingerFrom(adFrame(rows)).head()
    val same = (1L to 50L).flatMap(v => Seq(("g", v * 3, 1L), ("g", v * 3, 0L)))
    val rs = h(same)
    assert(rs.getDouble(3) == 1.0 && rs.getDouble(4) == 0.0, s"identical: $rs")
    val disj = (1L to 30L).map(v => ("g", v, 1L)) ++ (1L to 30L).map(v => ("g", v + 500L, 0L))
    val rd = h(disj)
    assert(rd.getDouble(3) == 0.0 && rd.getDouble(4) == 1.0, s"disjoint: $rd")
    // overlapping mixture: snapped naive recompute
    val mix = (1L to 40L).map(i => ("g", i % 7, 1L)) ++ (1L to 60L).map(i => ("g", i % 11, 0L))
    val rm = h(mix)
    val grid = mix.groupBy(_._2).toSeq.map { case (_, obs) =>
      (obs.count(_._3 == 1L).toLong, obs.count(_._3 == 0L).toLong)
    }
    val (na, nb) = (grid.map(_._1).sum.toDouble, grid.map(_._2).sum.toDouble)
    val bc9 = grid.map { case (ca, cb) =>
      math.floor(math.sqrt(ca * cb / (na * nb)) * 1e9 + 0.5).toLong
    }.sum
    assert(rm.getDouble(3) == math.rint(bc9 / 1e9 * 1e6) / 1e6, s"naive BC vs $rm")
    assert(rm.getDouble(4) ==
      math.rint(math.sqrt(math.max(0.0, 1.0 - bc9 / 1e9)) * 1e6) / 1e6)
  }

  // ------------------------------------------------- t97 Kendall's W
  test("t97: perfect concordance gives W = 1; W is chi2/(b(k-1)) of the t91 frame") {
    val s = spark; import s.implicits._
    // 4 sources rank 3 langs identically and strictly: W must be exactly 1
    val cells = for (src <- 1 to 4; l <- 1 to 3)
      yield (s"s$src", s"l$l", l * 1000000000L, 1L)
    val fr = TextOps.friedmanFrom(cells.toDF("source", "lang", "s9", "cnt"))
      .select("b", "k", "chi2").distinct().head()
    val w = math.rint(fr.getDouble(2) / (fr.getLong(0) * (fr.getLong(1) - 1)) * 1e6) / 1e6
    assert(w == 1.0, s"perfect concordance must give W 1, got $w")
    // the shipped t97 equals the same division of t91's own chi2 at sf0.001
    val dir = "/root/testdata/sf0.001"
    val got = TextOps.t97KendallW(spark, dir).head()
    val t91 = TextOps.t91Friedman(spark, dir).select("b", "k", "chi2").distinct().head()
    val want = math.rint(t91.getDouble(2) / (t91.getLong(0) * (t91.getLong(1) - 1)) * 1e6) / 1e6
    assert(got.getDouble(3) == want && got.getLong(0) == t91.getLong(0))
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
