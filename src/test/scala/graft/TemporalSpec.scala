package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audits, Graph, Temporal}
import graft.streaming.{PageHinkley, SeriesPoint}

/** Semantics of the temporal/drift batch (q103-q107): Kruskal-Wallis and
  * assortativity against naive driver-side recomputes, Kaplan-Meier
  * against the textbook 6-MP product-limit table AND a naive recompute of
  * the full cohort pipeline, seasonal decomposition against a planted
  * trend+weekday signal it must recover exactly, PSI against its two
  * defining regimes (zero under no drift, large under a planted shift),
  * and the streaming drift histogram ≡ its batch sibling. The DuckDB
  * hash gate covers cross-engine equality; these pin MEANING.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q103
  test("q103 Kruskal-Wallis matches a naive average-rank recompute") {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = Audits.q103KruskalWallis(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((st, grp) <- orders.groupBy(_._1)) {
      val n = grp.length
      // average ranks over the cents grid
      val byVal = grp.groupBy(_._3).view.mapValues(_.length).toMap
      val sortedVals = byVal.keys.toSeq.sorted
      var cum = 0L
      val avgRank = sortedVals.map { v =>
        val t = byVal(v)
        val r = cum + (t + 1) / 2.0
        cum += t
        v -> r
      }.toMap
      val byPrio = grp.groupBy(_._2)
      val sumTerm = byPrio.values.map { rows =>
        val rj = rows.map(r => avgRank(r._3)).sum
        rj * rj / rows.length
      }.sum
      val h = 12.0 / (n.toDouble * (n + 1)) * sumTerm - 3.0 * (n + 1)
      val ties = byVal.values.map(t => t.toDouble * t * t - t).sum
      val c = 1.0 - ties / (n.toDouble * n * n - n)
      val row = got(st)
      assert(row.getLong(1) == n.toLong, s"$st n")
      assert(row.getLong(2) == byPrio.size.toLong, s"$st k")
      assert(math.abs(row.getDouble(3) - h) < 1e-4, s"$st h: got ${row.getDouble(3)} want $h")
      assert(math.abs(row.getDouble(4) - h / c) < 1e-4, s"$st h_adj")
    }
  }

  test("q103 is ~0 when every group draws the same values, large under a planted shift") {
    // identical distributions: H must sit at its minimum (all rank mass
    // equal); then shift one priority far right: H must explode
    def kw(rows: Seq[(String, Long)]): Double = {
      val d = java.nio.file.Files.createTempDirectory("graft-kw").toString
      val s = spark; import s.implicits._
      rows.toDF("o_orderpriority", "c10")
        .select(lit("X").as("o_orderstatus"), col("o_orderpriority"),
          (col("c10").cast("double") / 100.0).as("o_totalprice"))
        .coalesce(1).write.parquet(s"$d/orders.parquet")
      val out = Audits.q103KruskalWallis(spark, d).collect()
      assert(out.length == 1)
      out.head.getDouble(4)
    }
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    val same = for (p <- prios; v <- 1L to 30L) yield (p, v * 100L)
    assert(math.abs(kw(same)) < 1e-6, "identical samples must give H_adj = 0")
    val shifted = same.map { case (p, v) =>
      if (p == "2-HIGH") (p, v + 100000L) else (p, v)
    }
    assert(kw(shifted) > 50.0, "a fully separated group must dominate the ranks")
  }

  // ---------------------------------------------------------------- q104
  test("q104 kaplanMeierFrom reproduces the textbook 6-MP product-limit table") {
    // Freireich et al. 1963 treatment arm — THE worked example every
    // survival text uses: events at 6,6,6,7,10,13,16,22,23; censored at
    // 6,9,10,11,17,19,20,25,32,32,34,35
    val s = spark; import s.implicits._
    val ev = Seq(6, 6, 6, 7, 10, 13, 16, 22, 23).map(t => (t.toLong, 1L))
    val cn = Seq(6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35).map(t => (t.toLong, 0L))
    val got = Temporal.kaplanMeierFrom((ev ++ cn).toDF("dur_s", "obs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    val want = Seq( // (t, n_risk, d, S) — classic table
      (6L, 21L, 3L, 0.857143), (7L, 17L, 1L, 0.806723),
      (10L, 15L, 1L, 0.752941), (13L, 12L, 1L, 0.690196),
      (16L, 11L, 1L, 0.627451), (22L, 7L, 1L, 0.537815),
      (23L, 6L, 1L, 0.448179))
    assert(got.length == want.length)
    for (((t, nr, d, sv), (wt, wnr, wd, wsv)) <- got.zip(want)) {
      assert(t == wt && nr == wnr && d == wd, s"step $t risk table")
      assert(math.abs(sv - wsv) < 1e-4, s"step $t survival: got $sv want $wsv")
    }
  }

  test("q104 hits exactly zero when the last risk set is wiped out") {
    val s = spark; import s.implicits._
    val got = Temporal.kaplanMeierFrom(
        Seq((1L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)).toDF("dur_s", "obs"))
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(got.last == ((3L, 0.0)), "full extinction must report S = 0, not exp(-inf) noise")
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(got.head._2 - 0.5) < 1e-6)
  }

  test("q104 on real events matches a naive cohort recompute") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val durs = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val clicks = rows.filter(_._2 == "click").map(_._3)
      if (clicks.isEmpty) None
      else {
        val c = clicks.min
        val ps = rows.filter(r => r._2 == "purchase" && r._3 >= c).map(_._3)
        if (ps.nonEmpty) Some(((ps.min - c) / 1000000L, true))
        else Some(((rows.map(_._3).max - c) / 1000000L, false))
      }
    }.toSeq
    // naive product-limit over the duration grid
    val byT = durs.groupBy(_._1).view
      .mapValues(v => (v.count(_._2), v.size)).toMap
    var atRisk = durs.size.toLong
    var surv = 1.0
    val naive = byT.keys.toSeq.sorted.flatMap { t =>
      val (d, tot) = byT(t)
      val row = if (d > 0) {
        surv *= (atRisk - d).toDouble / atRisk
        Some((t, atRisk, d.toLong, surv))
      } else None
      atRisk -= tot
      row
    }
    val got = Temporal.q104KaplanMeier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.length == naive.length, s"${got.length} vs ${naive.length} event steps")
    for (((t, nr, d, sv), (wt, wnr, wd, wsv)) <- got.zip(naive)) {
      assert(t == wt && nr == wnr && d == wd, s"risk table at $t")
      assert(math.abs(sv - wsv) < 1e-4, s"survival at $t: got $sv want $wsv")
    }
    // survival is a non-increasing step function from (0, 1]
    assert(got.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-9))
  }

  // ---------------------------------------------------------------- q105
  test("q105 recovers a planted trend + weekday signal exactly") {
    // additive plant: linear trend (its centered 7-day MA is itself) +
    // zero-mean weekday pattern (its 7-day MA is zero) → the operator
    // must return trend = the line, seasonal = the pattern, residual = 0
    val s = spark; import s.implicits._
    val pattern = Seq(300L, -200L, 500L, 0L, -400L, 100L, -300L) // cents, Σ=0
    val daily = (0 until 28).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong)),
        10000L + 100L * i + pattern(i % 7))
    }
    val got = Temporal.seasonalDecomposeFrom(daily.toDF("day", "rev_c"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay.toInt,
        r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 22, "28 days minus 3 boundary days each side")
    for ((i, rev, tr, se, res) <- got) {
      assert(math.abs(rev - (10000L + 100L * i + pattern(i % 7)) / 100.0) < 1e-9)
      assert(math.abs(tr - (10000.0 + 100.0 * i) / 100.0) < 1e-4, s"day $i trend")
      assert(math.abs(se - pattern(i % 7) / 100.0) < 1e-4, s"day $i seasonal")
      assert(math.abs(res) < 1e-3, s"day $i residual must vanish, got $res")
    }
  }

  test("q105 on real orders: components re-add to revenue; seasonals re-center") {
    val rows = operators.Temporal.q105SeasonalDecompose(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (rev, tr, se, res) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(rev - (tr + se + res)) < 1e-4, s"identity at ${r.getDate(0)}")
    }
    // the distinct seasonal values sum to ~0 (re-centered over the
    // weekdays present — a sparse sf0.001 calendar can lose some to the
    // full-window filter)
    val seasonals = rows.map(r =>
      (r.getDate(0).toLocalDate.toEpochDay % 7) -> r.getDouble(3)).toMap
    assert(seasonals.nonEmpty && seasonals.size <= 7)
    assert(math.abs(seasonals.values.sum) < 1e-3)
  }

  // ---------------------------------------------------------------- q106
  private def psiOf(ref: Seq[Long], cur: Seq[Long]) = {
    val s = spark; import s.implicits._
    val sided = (ref.map(_ -> 1L) ++ cur.map(_ -> 0L)).zipWithIndex
      .map { case ((c, r), i) => (c, i.toLong, r) }
      .toDF("cents", "o_orderkey", "is_ref")
    Temporal.psiDriftFrom(spark, sided).collect()
  }

  test("q106 PSI ~ 0 when current mirrors reference, large under a planted shift") {
    val base = (1L to 1000L).map(_ * 7L)
    val same = psiOf(base, base)
    assert(same.length == 10, "all ten bins, structurally")
    val psi = same.head.getDouble(6)
    assert(same.forall(_.getDouble(6) == psi), "one PSI total on every row")
    assert(math.abs(psi) < 1e-3, s"no drift → PSI ~ 0, got $psi")
    // equi-depth on 1000 distinct values: 100 per bin on BOTH sides
    assert(same.forall(r => r.getLong(1) == 100L && r.getLong(2) == 100L))
    // total mass ~1 per side (Jeffreys smoothing keeps it within 1e-3)
    assert(math.abs(same.map(_.getDouble(3)).sum - 1.0) < 1e-2)
    assert(math.abs(same.map(_.getDouble(4)).sum - 1.0) < 1e-2)

    val shifted = psiOf(base, base.map(_ + 4000L))
    val psiS = shifted.head.getDouble(6)
    assert(psiS > 1.0, s"mass pushed into the top bins must alarm, got $psiS")
    // industry rule of thumb: PSI > 0.25 = action threshold; the planted
    // shift is far past it while the null case is two orders below 0.1
  }

  test("q106 buckets are upper-inclusive on reference edges") {
    // values exactly AT an edge belong to the lower bucket (mirrors
    // max-per-bucket edge construction); all mass in bucket 1 iff all
    // values <= first edge
    val ref = (1L to 100L)
    val got = psiOf(ref, Seq(10L, 10L, 10L)) // 10 = edge of bucket 1
    val b1 = got.find(_.getLong(0) == 1L).get
    assert(b1.getLong(2) == 3L, "cur mass at the first edge stays in bucket 1")
  }

  // ------------------------------------------------- streaming sibling
  test("streaming drift histogram ≡ batch on the same data") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val edges = Seq(100L, 200L, 300L)
    val input = MemoryStream[Long]
    val q = Temporal.driftCountsFrom(input.toDF().toDF("v"), "v", edges)
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete").start()
    try {
      input.addData(50L, 100L, 101L, 250L)
      q.processAllAvailable()
      input.addData(301L, 99L, 200L)
      q.processAllAvailable()
      val streamed = spark.table("drift_counts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = Temporal.driftCountsFrom(
          Seq(50L, 100L, 101L, 250L, 301L, 99L, 200L).toDF("v"), "v", edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(batch == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    } finally q.stop()
  }

  // ---------------------------------------------------------------- q107
  test("q107 star graph is exactly -1; naive Pearson recompute on real edges") {
    val s = spark; import s.implicits._
    val star = (1L to 10L).map(i => (0L, i)).toDF("src", "dst")
    val r = Graph.assortativityFrom(star).collect().head
    assert(r.getLong(0) == 11L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == -1.0, "hub-and-spoke is perfectly disassortative")

    val result = Graph.q107Assortativity(spark, dir)
    val undEdges = {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).distinct
      li.toSeq.groupBy(_._1).values.toSeq.flatMap { parts =>
        val ps = parts.map(_._2)
        for (p1 <- ps; p2 <- ps if p1 < p2) yield (p1, p2)
      }.distinct
    }
    val deg = undEdges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairs = undEdges.flatMap(e =>
      Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m2 = pairs.length.toDouble
    val sx = pairs.map(_._1).sum.toDouble
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
    val want = (m2 * sxy - sx * sx) / (m2 * sxx - sx * sx)
    val got = result.collect().head
    assert(got.getLong(0) == deg.size.toLong)
    assert(got.getLong(1) == undEdges.length.toLong)
    assert(math.abs(got.getDouble(2) - want) < 1e-6,
      s"got ${got.getDouble(2)} want $want")
  }
  // ---------------------------------------------------------------- q120
  test("q120 ACF matches a naive recompute on the sf0.001 daily series") {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
    val xs = daily.orderBy(col("day")).collect().map(_.getLong(1).toDouble)
    val n = xs.length
    val mean = xs.sum / n
    val dev = xs.map(_ - mean)
    val den = dev.map(d => d * d).sum
    val got = Temporal.q120Acf(spark, dir).collect()
    assert(got.length == 7)
    var q = 0.0
    for (r <- got) {
      val k = r.getLong(0).toInt
      val num = (k until n).map(t => dev(t) * dev(t - k)).sum
      val rk = num / den
      assert(math.abs(r.getDouble(1) - rk) < 1e-5, s"lag $k acf: ${r.getDouble(1)} vs $rk")
      q += rk * rk / (n - k)
      val lb = n.toDouble * (n + 2) * q
      // the engine's Q accumulates on the snapped-integer grid: each of
      // the ≤7 terms truncates up to one 1e-9 unit, and the n(n+2)
      // prefactor amplifies that to ~7·n(n+2)/1e9 ≈ 0.04 at n≈2400 —
      // 0.1 absolute is the honest bound for "same law, snapped grid"
      assert(math.abs(r.getDouble(2) - lb) < 0.1,
        s"lag $k lb_q: ${r.getDouble(2)} vs $lb")
    }
  }

  test("q120 ACF spikes at the period of a planted period-7 signal, and Q is monotone") {
    import spark.implicits._
    // 280 days: strong weekday cycle + small deterministic jitter
    val daily = (0 until 280).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        100000L + 50000L * (if (i % 7 == 0) 1L else 0L) + (i * 37 % 11).toLong)
    }.toDF("day", "rev_c")
    val rows = Temporal.acfFrom(daily).collect()
    val byLag = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byLag(7L) > 0.9, s"lag-7 acf ${byLag(7L)} should be ~1 for a period-7 signal")
    assert(byLag(7L) > byLag(1L) + 0.5, "period lag must dominate lag 1")
    val qs = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a - 1e-9 }, "Ljung-Box Q monotone")
  }

  // ---------------------------------------------------------------- q121
  test("q121 Theil-Sen matches a naive pairwise-median recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length
    val slopes = (for {
      i <- 0 until n; j <- i + 1 until n
    } yield math.floor((daily(j) - daily(i)).toDouble / (j - i) * 1e6 + 0.5).toLong).sorted
    val np = slopes.length
    val med2 = slopes((np + 1) / 2 - 1) + slopes(np / 2)
    val wantSlope = med2.toDouble / 2e6
    // residuals on the same doubled grid (i is 1-based in the engine)
    val res = (0 until n).map(i =>
      BigInt(daily(i)) * 2000000 - BigInt(med2) * (i + 1)).sorted
    val int2 = res((n + 1) / 2 - 1) + res(n / 2)
    val wantIcept = int2.toDouble / 4e6
    val r = Temporal.q121TheilSen(spark, dir).head()
    assert(r.getLong(0) == n.toLong && r.getLong(1) == np.toLong)
    assert(math.abs(r.getDouble(2) - wantSlope) < 1e-6,
      s"slope ${r.getDouble(2)} want $wantSlope")
    assert(math.abs(r.getDouble(3) - wantIcept) < 1e-4,
      s"intercept ${r.getDouble(3)} want $wantIcept")
  }

  test("q121 recovers a planted line exactly and ignores a single outlier") {
    import spark.implicits._
    def series(vs: Seq[Long]) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(i)), v)
    }.toDF("day", "rev_c")
    val clean = Temporal.theilSenFrom(series((1 to 100).map(i => 5000L + 300L * i))).head()
    assert(clean.getDouble(2) == 300.0, s"slope ${clean.getDouble(2)}")
    assert(clean.getDouble(3) == 5000.0, s"intercept ${clean.getDouble(3)}")
    // one corrupted day: the pairwise-median slope must not move
    val dirty = Temporal.theilSenFrom(series(
      (1 to 100).map(i => if (i == 50) 99999999L else 5000L + 300L * i))).head()
    assert(dirty.getDouble(2) == 300.0, s"robust slope ${dirty.getDouble(2)}")
  }

  // ---------------------------------------------------------------- q122
  test("q122 Mann-Kendall matches a naive pairwise recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length
    val s = (for { i <- 0 until n; j <- i + 1 until n }
      yield java.lang.Long.signum(daily(j) - daily(i)).toLong).sum
    val tie18 = daily.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val var18 = n.toLong * (n - 1) * (2L * n + 5) - tie18
    val z =
      if (s > 0) (s - 1).toDouble / math.sqrt(var18 / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18 / 18.0)
      else 0.0
    val r = Temporal.q122MannKendall(spark, dir).head()
    assert(r.getLong(0) == n.toLong && r.getLong(1) == s && r.getLong(2) == var18)
    assert(math.abs(r.getDouble(3) - z) < 1e-6, s"z ${r.getDouble(3)} want $z")
  }

  test("q122 is maximal on a strict ramp and exactly zero on a constant series") {
    import spark.implicits._
    def series(vs: Seq[Long]) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(i)), v)
    }.toDF("day", "rev_c")
    val up = Temporal.mannKendallFrom(series((1 to 60).map(i => 100L + i))).head()
    assert(up.getLong(1) == 60L * 59 / 2, "strict ramp: every pair concordant")
    assert(up.getDouble(3) > 7.0, s"ramp z ${up.getDouble(3)} must be strongly positive")
    val const = Temporal.mannKendallFrom(series(Seq.fill(60)(777L))).head()
    assert(const.getLong(1) == 0L && const.getLong(2) == 0L && const.getDouble(3) == 0.0,
      "constant series: S = 0, tie-corrected variance 0, z defined 0")
  }

  // ---------------------------------------------------------------- q123
  test("q123 CUSUM matches a naive path recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
      .orderBy(col("day")).collect().map(r => (r.getDate(0), r.getLong(1)))
    val n = daily.length
    val s = daily.map(_._2).sum
    // scaled integral path c_t = sum(n*x - s); argmax |c| with day-asc tiebreak
    var c = BigInt(0)
    val path = daily.map { case (_, v) => c += BigInt(n) * v - s; c }
    val best = path.zipWithIndex.maxBy { case (ci, i) => (ci.abs, -i) }._2
    val r = Temporal.q123Cusum(spark, dir).head()
    assert(r.getLong(0) == n.toLong)
    assert(r.getDate(1) == daily(best)._1 && r.getLong(2) == (best + 1).toLong)
    // peak_cents = |n·C|/n = |C| on the cents grid
    assert(math.abs(r.getDouble(3) - (path(best).abs.toDouble / n)) < 1e-2)
    val before = daily.take(best + 1).map(_._2)
    assert(math.abs(r.getDouble(4) - before.sum.toDouble / before.length) < 1e-3)
    val after = daily.drop(best + 1).map(_._2)
    assert(math.abs(r.getDouble(5) - after.sum.toDouble / after.length) < 1e-3)
  }

  test("q123 localizes a planted level shift exactly") {
    import spark.implicits._
    val vs = Seq.fill(100)(100000L) ++ Seq.fill(100)(200000L)
    val daily = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)), v)
    }.toDF("day", "rev_c")
    val r = Temporal.cusumFrom(daily).head()
    assert(r.getLong(2) == 100L, s"change point at the shift, got i=${r.getLong(2)}")
    assert(r.getDouble(4) == 100000.0 && r.getDouble(5) == 200000.0,
      "segment means are the planted levels exactly")
    // peak mass: |C_100| = 100·|100000−150000| = 5e6 cents
    assert(math.abs(r.getDouble(3) - 5e6) < 1e-6, s"peak ${r.getDouble(3)}")
  }

  // ---------------------------------------------------------------- q124
  test("q124 runs test matches a naive recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length
    val sv = daily.sorted
    val med2 = sv((n + 1) / 2 - 1) + sv(n / 2)
    val sgns = daily.map(v => java.lang.Long.signum(2 * v - med2)).filter(_ != 0)
    val n1 = sgns.count(_ == 1).toLong
    val n2 = sgns.count(_ == -1).toLong
    val nn = n1 + n2
    val runs = 1L + sgns.zip(sgns.tail).count { case (a, b) => a != b }
    val e = 1.0 + 2.0 * n1 * n2 / nn
    val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn.toDouble * nn * (nn - 1))
    val r = Temporal.q124RunsTest(spark, dir).head()
    assert(r.getLong(0) == nn && r.getLong(1) == n1 && r.getLong(2) == n2
      && r.getLong(3) == runs)
    assert(math.abs(r.getDouble(4) - (runs - e) / math.sqrt(v)) < 1e-6,
      s"z ${r.getDouble(4)} want ${(runs - e) / math.sqrt(v)}")
  }

  test("q124 reads alternation as positive z and blocking as negative z") {
    import spark.implicits._
    def series(vs: Seq[Long]) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(i)), v)
    }.toDF("day", "rev_c")
    // perfect alternation: every step starts a run → R = n, z strongly +
    val alt = Temporal.runsTestFrom(series((0 until 80).map(i =>
      if (i % 2 == 0) 100L else 200L))).head()
    assert(alt.getLong(3) == 80L && alt.getDouble(4) > 8.0,
      s"alternating: R=${alt.getLong(3)}, z=${alt.getDouble(4)}")
    // two homogeneous blocks: R = 2, z strongly −
    val blk = Temporal.runsTestFrom(series(
      Seq.fill(40)(100L) ++ Seq.fill(40)(200L))).head()
    assert(blk.getLong(3) == 2L && blk.getDouble(4) < -8.0,
      s"blocked: R=${blk.getLong(3)}, z=${blk.getDouble(4)}")
  }

  // ---------------------------------------------------------------- q125
  test("q125 periodogram matches a naive recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length
    val s = daily.sum
    val dv = daily.map(v => BigInt(n) * v - s)
    val den = dv.map(d => d * d).sum
    val got = Temporal.q125Periodogram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (p <- Seq(7L, 30L, 91L, 365L)) {
      val a = dv.zipWithIndex.map { case (d, i) =>
        d * math.floor(math.cos(2 * math.Pi * ((i + 1) % p) / p) * 1e6 + 0.5).toLong }.sum
      val b = dv.zipWithIndex.map { case (d, i) =>
        d * math.floor(math.sin(2 * math.Pi * ((i + 1) % p) / p) * 1e6 + 0.5).toLong }.sum
      val want = (a * a + b * b).toDouble * 2.0 / (n.toDouble * den.toDouble * 1e12)
      assert(math.abs(got(p) - want) < 1e-6, s"period $p: ${got(p)} want $want")
    }
  }

  test("q125 concentrates power at a planted period-7 harmonic") {
    import spark.implicits._
    val daily = (0 until 280).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        math.round(1e6 * math.cos(2 * math.Pi * ((i + 1) % 7) / 7.0)))
    }.toDF("day", "rev_c")
    val got = Temporal.periodogramFrom(daily).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(7L) > 0.99, s"pure weekly harmonic: power ${got(7L)} must be ~1")
    assert(got(30L) < 0.02 && got(91L) < 0.02 && got(365L) < 0.02,
      s"off-period powers stay small: $got")
  }

  // ---------------------------------------------------------------- q126
  test("q126 Page-Hinkley matches a naive sequential replay on sf0.001") {
    val rows = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
      .orderBy(col("day")).collect().map(r => (r.getDate(0), r.getLong(1)))
    val ref = 365
    val sref = rows.take(ref).map(_._2).sum
    var m = BigInt(0); var mn = BigInt(Long.MaxValue); var mx = BigInt(Long.MinValue)
    var bestUp = (BigInt(-1), null: java.sql.Date); var bestDn = (BigInt(-1), null: java.sql.Date)
    for ((d, v) <- rows.drop(ref)) {
      m += BigInt(ref) * v - sref
      mn = mn.min(m); mx = mx.max(m)
      if (m - mn > bestUp._1) bestUp = (m - mn, d)
      if (mx - m > bestDn._1) bestDn = (mx - m, d)
    }
    val r = Temporal.q126PageHinkley(spark, dir).head()
    assert(r.getLong(0) == ref.toLong && r.getLong(1) == (rows.length - ref).toLong)
    assert(math.abs(r.getDouble(2) - sref.toDouble / ref) < 1e-3)
    assert(r.getDate(3) == bestUp._2 && r.getDate(5) == bestDn._2,
      s"peak days ${r.getDate(3)}/${r.getDate(5)} want ${bestUp._2}/${bestDn._2}")
    assert(math.abs(r.getDouble(4) - bestUp._1.toDouble / ref) < 1e-2)
    assert(math.abs(r.getDouble(6) - bestDn._1.toDouble / ref) < 1e-2)
  }

  test("streaming Page-Hinkley ≡ batch path, state straddling micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val daily = Tables.orders(spark, dir)
        .select(to_date(col("o_orderdate")).as("day"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
        .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
      val batch = Temporal.pageHinkleyPathFrom(daily, 365L)
        .select(col("seq"), col("ph_up"), col("ph_dn")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val series = daily.orderBy(col("day")).collect().map(_.getLong(1))
      val sref = series.take(365).sum
      val monitor = series.drop(365).zipWithIndex.map { case (v, i) =>
        SeriesPoint("rev", 366L + i, v)
      }
      // 3 in-order chunks: the cumulative deviation and both extrema must
      // flow through ValueState at each boundary
      val chunks = monitor.grouped(math.max(1, (monitor.length + 2) / 3)).toSeq
      assert(chunks.length == 3)
      val input = MemoryStream[SeriesPoint]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ph").toString
      val q = PageHinkley(input.toDF(), sref, 365L)
        .writeStream.format("memory").queryName("ph_path")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      val streamed = spark.table("ph_path").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(streamed.length == batch.length && batch.nonEmpty)
      assert(streamed.sameElements(batch),
        s"first diff: ${streamed.zip(batch).find { case (a, b) => a != b }}")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // ---------------------------------------------------------------- q133
  test("q133 DW reads ~4 on alternating, small on smooth, null on exact-line residuals") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i.toLong))
    val n = 60
    val rows =
      (0 until n).map(i => ("ALT", day(i),
        100000L + 500L * i + (if (i % 2 == 0) 20000L else -20000L))) ++
      (0 until n).map(i => ("SMO", day(i),
        100000L + 100L * (i - 30).toLong * (i - 30).toLong)) ++
      (0 until n).map(i => ("LIN", day(i), 1000L + 777L * i))
    val got = Temporal.durbinWatsonFrom(rows.toDF("grp", "day", "rev_c"))
      .collect().map(r => r.getString(0) -> r).toMap
    // alternating residuals: e_t ≈ ±c, diffs ≈ ∓2c → DW ≈ 4
    assert(got("ALT").getDouble(2) > 3.5, s"ALT dw ${got("ALT").getDouble(2)}")
    // parabolic residual arc: adjacent residuals nearly equal → DW ≈ 0
    assert(got("SMO").getDouble(2) < 1.0, s"SMO dw ${got("SMO").getDouble(2)}")
    // exact line: every snapped residual is 0 → den = 0 → guarded null
    assert(got("LIN").isNullAt(2) && got("LIN").isNullAt(3))
    // rho1 mirrors dw: 1 - dw/2, so ALT ≈ -1, SMO ≈ +1
    assert(got("ALT").getDouble(3) < -0.75 && got("SMO").getDouble(3) > 0.5)
  }

  test("q133 matches a naive BigInt residual recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("grp"), to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("grp"), col("day")).agg(sum(col("pc")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).filter(_._2.length >= 3).map { case (g, rs) =>
      val ys = rs.sortBy(_._2).map(_._3).zipWithIndex
        .map { case (y, i0) => (BigInt(i0 + 1), BigInt(y)) }
      val n = BigInt(ys.length)
      val si = ys.map(_._1).sum; val sy = ys.map(_._2).sum
      val sii = ys.map(p => p._1 * p._1).sum
      val siy = ys.map(p => p._1 * p._2).sum
      val v = sii * n - si * si
      val nm = siy * n - si * sy
      val r3 = ys.map { case (i, y) =>
        val e = y * v * n - v * sy + nm * si - nm * n * i
        math.floor(e.toDouble / (v * n).toDouble * 1000.0 + 0.5).toLong
      }
      val den = r3.map(x => BigInt(x) * x).sum
      val num = r3.zip(r3.tail).map { case (a, b) => BigInt(b - a) * (b - a) }.sum
      val dw = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      g -> (ys.length.toLong, dw)
    }
    val got = Temporal.q133DurbinWatson(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    for ((g, (wn, wdw)) <- want) {
      assert(got(g)._1 == wn, s"$g n_days ${got(g)._1} want $wn")
      assert(math.abs(got(g)._2 - wdw) < 1e-9, s"$g dw ${got(g)._2} want $wdw")
    }
  }

  // ---------------------------------------------------------------- q136
  test("q136 BP: growing residual amplitude reads high, stable amplitude low, flat drops") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i.toLong))
    val n = 80
    val rows =
      // heteroscedastic: residual amplitude grows linearly with i →
      // z² correlates strongly with i → R²_aux high, LM ≈ n·R²
      (0 until n).map(i => ("HET", day(i),
        500000L + 1000L * i + (if (i % 2 == 0) 300L * i else -300L * i))) ++
      // homoscedastic: near-constant amplitude with a small aperiodic
      // wobble (keeps the auxiliary variance positive) → R²_aux ≈ 0
      (0 until n).map(i => ("HOM", day(i),
        500000L + 1000L * i + (if (i % 2 == 0) 20000L + 100L * (i % 7)
          else -20000L - 100L * (i % 5)))) ++
      // exact line: σ̂ = 0 → excluded from the output entirely
      (0 until n).map(i => ("LIN", day(i), 1000L + 777L * i))
    val got = Temporal.breuschPaganFrom(rows.toDF("grp", "day", "rev_c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("HET", "HOM"), s"keys ${got.keySet}")
    assert(got("HET").getDouble(2) > 0.5, s"HET r2 ${got("HET").getDouble(2)}")
    assert(got("HOM").getDouble(2) < 0.1, s"HOM r2 ${got("HOM").getDouble(2)}")
    assert(got("HET").getDouble(3) > got("HOM").getDouble(3) * 10,
      "LM must separate the planted variance drift by an order of magnitude")
  }

  test("q136 matches a naive standardized-residual recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("grp"), to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("grp"), col("day")).agg(sum(col("pc")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).filter(_._2.length >= 3).flatMap { case (g, rs) =>
      val ys = rs.sortBy(_._2).map(_._3).zipWithIndex
        .map { case (y, i0) => (BigInt(i0 + 1), BigInt(y)) }
      val n = BigInt(ys.length)
      val si = ys.map(_._1).sum; val sy = ys.map(_._2).sum
      val sii = ys.map(p => p._1 * p._1).sum
      val siy = ys.map(p => p._1 * p._2).sum
      val v = sii * n - si * si
      val nm0 = siy * n - si * sy
      val r3 = ys.map { case (i, y) =>
        val e = y * v * n - v * sy + nm0 * si - nm0 * n * i
        math.floor(e.toDouble / (v * n).toDouble * 1000.0 + 0.5).toLong
      }
      val ss2 = r3.map(x => BigInt(x) * x).sum
      if (ss2 <= 0) None else {
        val sigma = math.sqrt(ss2.toDouble / n.toDouble)
        val zu6 = r3.map(x => math.floor(x.toDouble / sigma * 1e6 + 0.5).toLong)
        val u = zu6.map(z => BigInt(z) * z)
        val su = u.sum
        val siu = u.zipWithIndex.map { case (x, i0) => BigInt(i0 + 1) * x }.sum
        val suu = u.map(x => x * x).sum
        val vi = sii * n - si * si
        val nm = siu * n - si * su
        val vu = suu * n - su * su
        if (vu <= 0) None else {
          val r2 = nm.toDouble * nm.toDouble / (vi.toDouble * vu.toDouble)
          def r6(x: Double) =
            BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some(g -> ((ys.length.toLong, r6(r2), r6(n.toDouble * r2))))
        }
      }
    }
    val got = Temporal.q136BreuschPagan(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    for ((g, (wn, wr2, wbp)) <- want) {
      assert(got(g)._1 == wn, s"$g n_days")
      assert(math.abs(got(g)._2 - wr2) < 1e-9, s"$g r2 ${got(g)._2} want $wr2")
      assert(math.abs(got(g)._3 - wbp) < 1e-9, s"$g bp ${got(g)._3} want $wbp")
    }
  }

  // ---------------------------------------------------------------- q137
  test("q137 JB: symmetric residuals read S~0, one-sided spikes read S>1, platykurtic K<3") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i.toLong))
    val n = 90
    val rows =
      // symmetric alternating residuals: S ≈ 0, two-point K ≈ 1 → JB from tails
      (0 until n).map(i => ("SYM", day(i),
        100000L + 500L * i + (if (i % 2 == 0) 10000L else -10000L))) ++
      // rare large POSITIVE spikes over a flat base: strong right skew
      (0 until n).map(i => ("SKW", day(i),
        100000L + 500L * i + (if (i % 15 == 0) 90000L else 0L)))
    val got = Temporal.jarqueBeraFrom(rows.toDF("grp", "day", "rev_c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(got("SYM").getDouble(2)) < 0.05, s"SYM S ${got("SYM").getDouble(2)}")
    assert(got("SYM").getDouble(3) < 1.5, s"SYM K ${got("SYM").getDouble(3)}")
    assert(got("SKW").getDouble(2) > 1.0, s"SKW S ${got("SKW").getDouble(2)}")
    // both depart normality hard — JB far above the χ²(2) 5% bar (~6)
    assert(got("SYM").getDouble(4) > 6.0 && got("SKW").getDouble(4) > 6.0)
  }

  test("q137 matches a naive standardized-moment recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("grp"), to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("grp"), col("day")).agg(sum(col("pc")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = daily.groupBy(_._1).filter(_._2.length >= 3).flatMap { case (g, rs) =>
      val ys = rs.sortBy(_._2).map(_._3).zipWithIndex
        .map { case (y, i0) => (BigInt(i0 + 1), BigInt(y)) }
      val n = BigInt(ys.length)
      val si = ys.map(_._1).sum; val sy = ys.map(_._2).sum
      val sii = ys.map(p => p._1 * p._1).sum
      val siy = ys.map(p => p._1 * p._2).sum
      val v = sii * n - si * si
      val nm0 = siy * n - si * sy
      val r3 = ys.map { case (i, y) =>
        val e = y * v * n - v * sy + nm0 * si - nm0 * n * i
        math.floor(e.toDouble / (v * n).toDouble * 1000.0 + 0.5).toLong
      }
      val ss2 = r3.map(x => BigInt(x) * x).sum
      if (ss2 <= 0) None else {
        val sigma = math.sqrt(ss2.toDouble / n.toDouble)
        val zu6 = r3.map(x => math.floor(x.toDouble / sigma * 1e6 + 0.5).toLong)
        val sz2 = zu6.map(z => BigInt(z) * z).sum
        val sz3 = zu6.map(z => BigInt(z) * z * z).sum
        val sz4 = zu6.map(z => BigInt(z) * z * (BigInt(z) * z)).sum
        val m2 = sz2.toDouble / n.toDouble
        val s = (sz3.toDouble / n.toDouble) / (m2 * math.sqrt(m2))
        val k = (sz4.toDouble / n.toDouble) / (m2 * m2)
        val jb = n.toDouble * (s * s / 6.0 + (k - 3.0) * (k - 3.0) / 24.0)
        Some(g -> ((ys.length.toLong, r6(s), r6(k), r6(jb))))
      }
    }
    val got = Temporal.q137JarqueBera(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    for ((g, (wn, ws, wk, wjb)) <- want) {
      assert(got(g)._1 == wn, s"$g n_days")
      assert(math.abs(got(g)._2 - ws) < 1e-9, s"$g S ${got(g)._2} want $ws")
      assert(math.abs(got(g)._3 - wk) < 1e-9, s"$g K ${got(g)._3} want $wk")
      assert(math.abs(got(g)._4 - wjb) < 1e-9, s"$g JB ${got(g)._4} want $wjb")
    }
  }

  // ---------------------------------------------------------------- q138
  test("q138 ARCH LM: regime-switching volatility reads high, shuffled amplitudes low") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i.toLong))
    val n = 96
    // calm/volatile regimes of 16 days each: |residual| persists → u_t
    // tracks u_{t−1} → R²_aux high
    def ampC(i: Int) = if ((i / 16) % 2 == 0) 2000L else 40000L
    // hash-scrambled amplitudes (murmur finalizer): u_t carries no
    // information about u_{t−1} (neither positive nor negative structure)
    def ampI(i: Int): Long = {
      var x = i.toLong * 0x9E3779B97F4A7C15L
      x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 33)
      1000L + (x & 0x7FFFFFFFL) % 30000L
    }
    val rows =
      (0 until n).map(i => ("CLU", day(i),
        300000L + 800L * i + (if (i % 2 == 0) ampC(i) else -ampC(i)))) ++
      (0 until n).map(i => ("IND", day(i),
        300000L + 800L * i + (if (i % 2 == 0) ampI(i) else -ampI(i))))
    val got = Temporal.archLmFrom(rows.toDF("grp", "day", "rev_c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("CLU", "IND"))
    assert(got("CLU").getLong(1) == (n - 1).toLong)
    assert(got("CLU").getDouble(2) > 0.5, s"CLU r2 ${got("CLU").getDouble(2)}")
    assert(got("IND").getDouble(2) < 0.2, s"IND r2 ${got("IND").getDouble(2)}")
    assert(got("CLU").getDouble(3) > got("IND").getDouble(3) * 5,
      "LM must separate persistent from interleaved volatility")
  }

  test("q138 matches a naive lag-pair recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("grp"), to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("grp"), col("day")).agg(sum(col("pc")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = daily.groupBy(_._1).filter(_._2.length >= 3).flatMap { case (g, rs) =>
      val ys = rs.sortBy(_._2).map(_._3).zipWithIndex
        .map { case (y, i0) => (BigInt(i0 + 1), BigInt(y)) }
      val n = BigInt(ys.length)
      val si = ys.map(_._1).sum; val sy0 = ys.map(_._2).sum
      val sii = ys.map(p => p._1 * p._1).sum
      val siy = ys.map(p => p._1 * p._2).sum
      val v = sii * n - si * si
      val nm0 = siy * n - si * sy0
      val r3 = ys.map { case (i, y) =>
        val e = y * v * n - v * sy0 + nm0 * si - nm0 * n * i
        math.floor(e.toDouble / (v * n).toDouble * 1000.0 + 0.5).toLong
      }
      val ss2 = r3.map(x => BigInt(x) * x).sum
      if (ss2 <= 0) None else {
        val sigma = math.sqrt(ss2.toDouble / n.toDouble)
        val u = r3.map(x => math.floor(x.toDouble / sigma * 1e6 + 0.5).toLong)
          .map(z => BigInt(z) * z)
        val pairs = u.tail.zip(u.init) // (u_t, u_{t-1})
        val np = BigInt(pairs.length)
        val sy = pairs.map(_._1).sum; val sx = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val syy = pairs.map(p => p._1 * p._1).sum
        val sxx = pairs.map(p => p._2 * p._2).sum
        val vx = sxx * np - sx * sx; val vy = syy * np - sy * sy
        val nm = sxy * np - sx * sy
        if (vx <= 0 || vy <= 0) None else {
          val r2 = nm.toDouble * nm.toDouble / (vx.toDouble * vy.toDouble)
          Some(g -> ((pairs.length.toLong, r6(r2), r6(np.toDouble * r2))))
        }
      }
    }
    val got = Temporal.q138ArchLm(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    for ((g, (wn, wr2, wlm)) <- want) {
      assert(got(g)._1 == wn, s"$g n_pairs")
      assert(math.abs(got(g)._2 - wr2) < 1e-9, s"$g r2 ${got(g)._2} want $wr2")
      assert(math.abs(got(g)._3 - wlm) < 1e-9, s"$g lm ${got(g)._3} want $wlm")
    }
  }

  // ---------------------------------------------------------------- q139
  test("q139 Hurst: persistent ramp reads H near 1, alternating series reads low H") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i.toLong))
    val n = 128
    val rows =
      // strong smooth trend: partial sums range grows ~linearly with m → H ≈ 1
      (0 until n).map(i => ("PER", day(i), 100000L + 2000L * i)) ++
      // alternating (maximally mean-reverting): range saturates → H ≈ 0
      (0 until n).map(i => ("ANT", day(i),
        100000L + (if (i % 2 == 0) 5000L else -5000L)))
    val got = Temporal.hurstFrom(rows.toDF("grp", "day", "rev_c")).collect()
    val h = got.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(h("PER") > 0.8, s"PER H ${h("PER")}")
    assert(h("ANT") < 0.3, s"ANT H ${h("ANT")}")
    // 4 sizes per group, block counts halve as m doubles (128 = 16·8 = 2·64)
    val per = got.filter(_.getString(0) == "PER").map(r => (r.getLong(1), r.getLong(2)))
    assert(per.toSeq == Seq((8L, 16L), (16L, 8L), (32L, 4L), (64L, 2L)))
  }

  test("q139 matches a naive blockwise R/S recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("grp"), to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("grp"), col("day")).agg(sum(col("pc")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = daily.groupBy(_._1).flatMap { case (g, rs0) =>
      val xs = rs0.sortBy(_._2).map(_._3)
      val pts = Seq(8, 16, 32, 64).flatMap { m =>
        val rsu = xs.grouped(m).filter(_.length == m).flatMap { blk =>
          val bs = blk.map(BigInt(_)).sum
          val d = blk.map(x => BigInt(m) * x - bs)
          val cum = d.scanLeft(BigInt(0))(_ + _).tail
          val r = cum.max - cum.min
          val sd2 = d.map(x => x * x).sum
          if (sd2 <= 0) None
          else Some(math.floor(r.toDouble * math.sqrt(m.toDouble)
            / math.sqrt(sd2.toDouble) * 1e6 + 0.5).toLong)
        }.toSeq
        val srs = rsu.sum
        if (rsu.isEmpty || srs <= 0) None
        else Some((m.toLong, rsu.length.toLong, srs,
          math.floor(math.log(m.toDouble) * 1e6 + 0.5).toLong,
          math.floor(math.log(srs.toDouble / rsu.length.toDouble / 1e6)
            * 1e6 + 0.5).toLong))
      }
      if (pts.length < 2) Nil else {
        val np = pts.length.toLong
        val sx = pts.map(_._4).sum; val sy = pts.map(_._5).sum
        val sxy = pts.map(p => p._4 * p._5).sum
        val sxx = pts.map(p => p._4 * p._4).sum
        val h = r6((np * sxy - sx * sy).toDouble / (np * sxx - sx * sx).toDouble)
        pts.map { case (m, nb, srs, _, _) =>
          (g, m) -> ((nb, r6(srs.toDouble / nb.toDouble / 1e6), h))
        }
      }
    }
    val got = Temporal.q139Hurst(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    for ((k, (wnb, wrs, wh)) <- want) {
      assert(got(k)._1 == wnb, s"$k n_blocks")
      assert(math.abs(got(k)._2 - wrs) < 1e-9, s"$k mean_rs ${got(k)._2} want $wrs")
      assert(math.abs(got(k)._3 - wh) < 1e-9, s"$k h ${got(k)._3} want $wh")
    }
  }

  // ---------------------------------------------------------------- q140
  test("q140 PACF cuts off after lag 1 on an AR(1)-like ramp; alternating reads -1") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i.toLong))
    // slowly-wandering level: every lag's ACF is high, but once lag 1 is
    // regressed out nothing remains — the AR(1) signature
    val ramp = (0 until 300).map(i =>
      (day(i), 1000000L + 3000L * i + (i * i % 97).toLong * 40L)).toDF("day", "rev_c")
    val pr = Temporal.pacfFrom(ramp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pr(1L) > 0.9, s"lag-1 pacf ${pr(1L)}")
    assert((2 to 7).forall(k => math.abs(pr(k.toLong)) < 0.35),
      s"higher lags must collapse: $pr")
    val alt = (0 until 300).map(i =>
      (day(i), 1000000L + (if (i % 2 == 0) 40000L else -40000L))).toDF("day", "rev_c")
    val pa = Temporal.pacfFrom(alt).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pa(1L) < -0.95, s"alternating lag-1 pacf ${pa(1L)}")
  }

  test("q140 matches an independent Durbin-Levinson recompute on sf0.001") {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("pc"))
      .groupBy(col("day")).agg(sum(col("pc")).as("rev_c"))
    val xs = daily.orderBy(col("day")).collect().map(_.getLong(1).toDouble)
    val n = xs.length
    val mean = xs.sum / n
    val dev = xs.map(_ - mean)
    val den = dev.map(d => d * d).sum
    val r = (1 to 7).map(k => (k until n).map(t => dev(t) * dev(t - k)).sum / den)
    // independent recursion (array form, not the engine's named columns)
    val phi = Array.ofDim[Double](8, 8)
    phi(1)(1) = r(0)
    for (k <- 2 to 7) {
      val numv = r(k - 1) - (1 until k).map(j => phi(k - 1)(j) * r(k - j - 1)).sum
      val denv = 1.0 - (1 until k).map(j => phi(k - 1)(j) * r(j - 1)).sum
      phi(k)(k) = numv / denv
      for (j <- 1 until k) phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
    }
    val got = Temporal.q140Pacf(spark, dir).collect()
      .map(row => row.getLong(0).toInt -> ((row.getDouble(1), row.getDouble(2)))).toMap
    assert(got.keySet == (1 to 7).toSet)
    for (k <- 1 to 7) {
      assert(math.abs(got(k)._1 - r(k - 1)) < 1e-5, s"lag $k acf")
      // engine runs the recursion on the nano-snapped r grid; 1e-4 is the
      // honest bound after ≤7 recursion steps amplify the ≤1e-9 snaps
      assert(math.abs(got(k)._2 - phi(k)(k)) < 1e-4,
        s"lag $k pacf ${got(k)._2} vs ${phi(k)(k)}")
    }
  }

}
