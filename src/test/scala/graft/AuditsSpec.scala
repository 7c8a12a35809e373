package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audits

/** Semantics of the statistical-audit operators (q92 Benford, q93 basket
  * association rules, q94 Gini). The DuckDB hash gate covers cross-engine
  * equality; these specs pin the MEANING against naive driver-side
  * recomputations and the closed-form invariants each statistic obeys.
  */
class AuditsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q92 digit histogram sums to the scan count and freqs to ~1") {
    val rows = Audits.q92Benford(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9))
    val total = graft.Tables.lineitem(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    val obsSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 1e-4)
    // all 9 Benford cells are always present (zero-count digits included
    // since ADVICE r09), so the expected mass is the full law, ~1
    assert(rows.length == 9)
    val expSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(expSum - 1.0) < 1e-4)
    assert(rows.forall(_.getDouble(4) >= 0.0)) // chi2 parts non-negative
  }

  test("q92 emits zero-count cells: a digit the data never produces still contributes") {
    // planted lineitem whose prices ALL lead with digit 1 — the exact
    // skewed input where dropping absent cells would understate chi2
    val d = java.nio.file.Files.createTempDirectory("graft-benford").toString
    val s = spark; import s.implicits._
    Seq(10.0, 11.5, 150.0, 1999.99, 12.0)
      .toDF("l_extendedprice")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val rows = Audits.q92Benford(spark, d).collect()
    assert(rows.length == 9, "all 9 Benford cells even when 8 digits are absent")
    val byDigit = rows.map(r => r.getInt(0) -> r).toMap
    assert(byDigit(1).getLong(1) == 5L)
    for (dig <- 2 to 9) {
      assert(byDigit(dig).getLong(1) == 0L, s"digit $dig n")
      assert(byDigit(dig).getDouble(2) == 0.0, s"digit $dig obs_freq")
      // absent cell's chi2 part is tot·p_d — the full expected mass
      val p = math.log10(1.0 + 1.0 / dig)
      assert(math.abs(byDigit(dig).getDouble(4) - 5.0 * p) < 1e-4, s"digit $dig chi2")
    }
  }

  test("q92 digits match a naive recomputation") {
    val naive = graft.Tables.lineitem(spark, dir)
      .select(col("l_extendedprice")).collect()
      .map(r => r.getDouble(0).toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Audits.q92Benford(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == naive)
  }

  test("q93 rules match a naive pair count; lift/confidence arithmetic holds") {
    val baskets = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nOrders = byOrder.size.toLong
    val itemN = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairN = byOrder.values.flatMap { parts =>
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)
    val got = Audits.q93BasketLift(spark, dir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == pairN.keySet)
    for (r <- got) {
      val (a, b, nab, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      assert(nab == pairN((a, b)) && na == itemN(a) && nb == itemN(b))
      assert(math.abs(r.getDouble(5) - nab.toDouble / na) < 1e-6)
      assert(math.abs(r.getDouble(6) - nab.toDouble * nOrders / (na.toDouble * nb)) < 1e-6)
    }
    // ordered by lift desc with deterministic tie-break
    val lifts = got.map(r => (-r.getDouble(6), r.getLong(0), r.getLong(1))).toSeq
    assert(lifts == lifts.sorted)
  }

  test("q94 gini matches a naive rank-formula recomputation and is in [0,1)") {
    val got = Audits.q94Gini(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val li = graft.Tables.lineitem(spark, dir)
      .join(graft.Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((nation, rows) <- li.groupBy(_._1)) {
      val perCust = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
        .sortBy { case (ck, cents) => (cents, ck) }.map(_._2)
      val n = perCust.length
      val sx = perCust.sum
      val six = perCust.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val gini = 2.0 * six / (n * sx.toDouble) - (n + 1.0) / n
      val (gn, grev, gg) = got(nation)
      assert(gn == n, s"$nation n_cust")
      assert(math.abs(grev - sx / 100.0) < 0.02, s"$nation total")
      assert(math.abs(gg - gini) < 1e-6, s"$nation gini")
      assert(gg >= 0.0 && gg < 1.0)
    }
    assert(got.keySet == li.map(_._1).toSet)
  }

  test("q98 theil matches a naive recomputation and sits in [0, ln n]") {
    val got = Audits.q98Theil(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    // the q94 grid recomputed naively: per-customer exact cents → nation
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")).collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * (1.0 - r.getDouble(2)) * 100.0 + 0.5).toLong))
    val ordCust = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val custNation = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nationName = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val revByCust = li.flatMap { case (ok, cents) => ordCust.get(ok).map(_ -> cents) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = revByCust.toSeq
      .map { case (ck, cents) => (nationName(custNation(ck)), cents) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (nn, xs) =>
        val n = xs.length.toLong
        val sx = xs.map(_._2).sum
        val s9 = xs.map { case (_, x) =>
          val r = x.toDouble * n.toDouble / sx.toDouble
          math.floor(r * math.log(r) * 1e9 + 0.5).toLong
        }.sum
        (nn, n, r2(sx.toDouble / 100.0), r6(s9.toDouble / (n.toDouble * 1e9)))
      }
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    for ((nn, n, _, t) <- got) {
      assert(t >= -1e-6 && t <= math.log(n.toDouble) + 1e-6,
        s"$nn: Theil must sit in [0, ln n], got $t")
    }
  }

  // -- two-sample inference suite (q90/q91/q99) -------------------------

  /** Textbook Welch from raw values — deliberately NOT the query's
    * moment-sum path (two-pass centered variance vs one-pass sums).
    */
  private def naiveWelch(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    def mv(x: Seq[Double]) = {
      val n = x.size; val m = x.sum / n
      (m, x.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    val (ma, va) = mv(a); val (mb, vb) = mv(b)
    val sea = va / a.size; val seb = vb / b.size
    ((ma - mb) / math.sqrt(sea + seb),
      (sea + seb) * (sea + seb) /
        (sea * sea / (a.size - 1) + seb * seb / (b.size - 1)))
  }

  /** Rank-based Mann-Whitney from raw values with average-rank ties —
    * the O(n log n) sort-and-walk form, not the query's grid algebra.
    */
  private def naiveMwu(a: Seq[Long], b: Seq[Long]): (Double, Double) = {
    val arr = (a ++ b).sorted
    val avgRank = arr.zipWithIndex.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val ra = a.map(avgRank).sum
    val ua = ra - a.size.toDouble * (a.size + 1) / 2
    val n = arr.size
    val tieSum = arr.groupBy(identity).values
      .map(g => math.pow(g.size.toDouble, 3) - g.size).sum
    val varU = a.size.toDouble * b.size / 12.0 *
      ((n + 1) - tieSum / (n.toDouble * (n - 1)))
    (ua, (ua - a.size.toDouble * b.size / 2) / math.sqrt(varU))
  }

  /** The per-nation (cents, is_a) base both q90 and q99 aggregate —
    * recomputed by driver-side joins over the raw tables.
    */
  private lazy val naiveSegmentCents: Map[String, (Seq[Long], Seq[Long])] = {
    val custSeg = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    val nationName = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .flatMap { r =>
        custSeg.get(r.getLong(0)).collect {
          case (nk, seg) if seg == "BUILDING" || seg == "MACHINERY" =>
            (nationName(nk), seg, math.floor(r.getDouble(1) * 100.0 + 0.5).toLong)
        }
      }
      .groupBy(_._1).view.mapValues { xs =>
        (xs.filter(_._2 == "BUILDING").map(_._3).toSeq,
          xs.filter(_._2 == "MACHINERY").map(_._3).toSeq)
      }.toMap
  }

  test("q90 Welch t ≡ textbook two-pass recompute per nation") {
    val got = Audits.q90WelchTtest(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (as, bs) = naiveSegmentCents(r.getString(0))
      assert(r.getLong(1) == as.size && r.getLong(2) == bs.size, s"${r.getString(0)} sizes")
      val (t, df) = naiveWelch(as.map(_.toDouble), bs.map(_.toDouble))
      assert(math.abs(r.getDouble(5) - t) < 1e-4, s"${r.getString(0)} t: ${r.getDouble(5)} vs $t")
      assert(math.abs(r.getDouble(6) - df) < 0.05, s"${r.getString(0)} df: ${r.getDouble(6)} vs $df")
      val meanA = as.sum.toDouble / as.size / 100.0
      assert(math.abs(r.getDouble(3) - meanA) < 1e-3, s"${r.getString(0)} mean_a")
    }
    // every SegA/SegB nation with n>=2 per side appears — nothing dropped
    val want = naiveSegmentCents.filter { case (_, (a, b)) => a.size >= 2 && b.size >= 2 }
    assert(got.map(_.getString(0)).toSet == want.keySet)
  }

  test("q90 planted samples: zero shift ⇒ t = 0; known shift matches hand formula") {
    val d = java.nio.file.Files.createTempDirectory("graft-welch").toString
    val s = spark; import s.implicits._
    // nation 0: identical samples (t = 0 exactly — same mean, any var);
    // nation 1: a shifted pair with unequal variances
    val orders = Seq(
      (1L, 10.0), (1L, 20.0), (1L, 30.0), (2L, 10.0), (2L, 20.0), (2L, 30.0),
      (3L, 1.0), (3L, 2.0), (3L, 3.0), (3L, 4.0), (3L, 5.0),
      (4L, 2.0), (4L, 4.0), (4L, 6.0), (4L, 8.0), (4L, 10.0), (4L, 12.0))
    orders.toDF("o_custkey", "o_totalprice")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    Seq((1L, 0, "BUILDING"), (2L, 0, "MACHINERY"),
        (3L, 1, "BUILDING"), (4L, 1, "MACHINERY"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    Seq((0, "SAME"), (1, "SHIFT")).toDF("n_nationkey", "n_name")
      .coalesce(1).write.parquet(s"$d/nation.parquet")
    val got = Audits.q90WelchTtest(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("SAME").getDouble(5) == 0.0)
    val (t, df) = naiveWelch(Seq(100.0, 200, 300, 400, 500),
      Seq(200.0, 400, 600, 800, 1000, 1200))
    assert(math.abs(got("SHIFT").getDouble(5) - t) < 1e-6)
    assert(math.abs(got("SHIFT").getDouble(6) - df) < 1e-2)
  }

  test("q91 KS d ≡ naive ECDF sup-difference per status") {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong,
        r.getString(2) == "1-URGENT"))
    val got = Audits.q91KsTest(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val rows = base.filter(_._1 == r.getString(0))
      val a = rows.filter(_._3).map(_._2).toSeq.sorted
      val b = rows.filterNot(_._3).map(_._2).toSeq.sorted
      assert(r.getLong(1) == a.size && r.getLong(2) == b.size)
      val d = (a ++ b).distinct.map { v =>
        math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
      }.max
      assert(math.abs(r.getDouble(3) - d) < 1e-6, s"${r.getString(0)} D: ${r.getDouble(3)} vs $d")
      val z = d * math.sqrt(a.size.toDouble * b.size / (a.size + b.size))
      assert(math.abs(r.getDouble(4) - z) < 1e-4)
    }
  }

  test("q91 planted: identical samples ⇒ D = 0; disjoint ranges ⇒ D = 1") {
    val d = java.nio.file.Files.createTempDirectory("graft-ks").toString
    val s = spark; import s.implicits._
    val same = Seq(1.0, 2.0, 3.0).flatMap(v =>
      Seq(("O", v, "1-URGENT"), ("O", v, "5-LOW")))
    val disjoint = Seq(("F", 1.0, "1-URGENT"), ("F", 2.0, "1-URGENT"),
      ("F", 10.0, "5-LOW"), ("F", 20.0, "5-LOW"))
    (same ++ disjoint ++ Seq(("P", 5.0, "3-MEDIUM"))) // non-sample priority drops out
      .toDF("o_orderstatus", "o_totalprice", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = Audits.q91KsTest(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!got.contains("P"), "a status with only one sample present must drop")
    assert(got("O").getDouble(3) == 0.0 && got("O").getDouble(4) == 0.0)
    assert(got("F").getDouble(3) == 1.0, "fully separated samples reach the sup bound")
  }

  test("q99 Mann-Whitney U/z ≡ rank-based recompute per nation (ties included)") {
    val got = Audits.q99MannWhitney(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (as, bs) = naiveSegmentCents(r.getString(0))
      val (ua, z) = naiveMwu(as, bs)
      assert(r.getLong(1) == as.size && r.getLong(2) == bs.size)
      assert(math.abs(r.getDouble(3) - ua) < 1e-6, s"${r.getString(0)} U: ${r.getDouble(3)} vs $ua")
      assert(math.abs(r.getDouble(4) - z) < 1e-4, s"${r.getString(0)} z: ${r.getDouble(4)} vs $z")
    }
  }

  test("q100 ANOVA F ≡ textbook centered SSB/SSW recompute per status") {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5)))
    val got = Audits.q100Anova(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val rows = base.filter(_._1 == r.getString(0))
      val groups = rows.groupBy(_._2).values.map(_.map(_._3).toSeq).toSeq
      val n = rows.length
      assert(r.getLong(1) == n && r.getLong(2) == groups.size)
      val grand = rows.map(_._3).sum / n
      val ssb = groups.map(g => g.size * math.pow(g.sum / g.size - grand, 2)).sum
      val ssw = groups.map(g => { val m = g.sum / g.size; g.map(v => (v - m) * (v - m)).sum }).sum
      val f = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
      assert(math.abs(r.getDouble(3) - f) / math.max(1.0, f) < 1e-6,
        s"${r.getString(0)} F: ${r.getDouble(3)} vs $f")
      assert(math.abs(r.getDouble(4) - ssb / (ssb + ssw)) < 1e-6)
    }
  }

  test("q101 chi2 ≡ naive contingency recompute; grid is complete; contribs sum to chi2") {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderstatus")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = Audits.q101Chi2Independence(spark, dir).collect()
    val nr = base.map(_._1).distinct.length; val nc = base.map(_._2).distinct.length
    assert(got.length == nr * nc, "every R×C cell present, observed or not")
    assert(got.map(_.getLong(2)).sum == base.length)
    assert(got.forall(_.getLong(6) == (nr - 1).toLong * (nc - 1)))
    val n = base.length.toDouble
    var chi2 = 0.0
    for (r <- got) {
      val ri = base.count(_._1 == r.getString(0)).toDouble
      val cj = base.count(_._2 == r.getString(1)).toDouble
      val e = ri * cj / n
      assert(math.abs(r.getDouble(3) - e) < 1e-4, s"cell expected: ${r.getDouble(3)} vs $e")
      val o = r.getLong(2).toDouble
      chi2 += (o - e) * (o - e) / e
    }
    assert(got.map(_.getDouble(5)).distinct.length == 1, "chi2 is one statistic")
    assert(math.abs(got.head.getDouble(5) - chi2) < 1e-3, s"${got.head.getDouble(5)} vs $chi2")
    val contribSum = got.map(_.getDouble(4)).sum
    assert(math.abs(contribSum - got.head.getDouble(5)) < 1e-3)
  }

  test("q99 planted ties: U and z match the tie-corrected hand computation") {
    val d = java.nio.file.Files.createTempDirectory("graft-mwu").toString
    val s = spark; import s.implicits._
    // heavy ties ACROSS samples: A = [1,2,2,3], B = [2,2,3,3,4]
    val a = Seq(1.0, 2.0, 2.0, 3.0); val b = Seq(2.0, 2.0, 3.0, 3.0, 4.0)
    (a.zipWithIndex.map { case (v, i) => (100L + i, v) } ++
      b.zipWithIndex.map { case (v, i) => (200L + i, v) })
      .toDF("o_custkey", "o_totalprice")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    (a.indices.map(i => (100L + i, 0, "BUILDING")) ++
      b.indices.map(i => (200L + i, 0, "MACHINERY")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    Seq((0, "TIES")).toDF("n_nationkey", "n_name")
      .coalesce(1).write.parquet(s"$d/nation.parquet")
    val got = Audits.q99MannWhitney(spark, d).collect()
    assert(got.length == 1)
    val (ua, z) = naiveMwu(a.map(v => (v * 100).toLong), b.map(v => (v * 100).toLong))
    assert(got(0).getDouble(3) == ua, s"U: ${got(0).getDouble(3)} vs $ua")
    assert(math.abs(got(0).getDouble(4) - z) < 1e-6)
  }

  // ---------------------------------------------------------------- q109
  private def asP(z: Double): Double = { // the same A&S 7.1.26 shape
    val x = math.abs(z) / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t
    1.0 - (1.0 - poly * math.exp(-x * x))
  }

  test("q109 BH matches a naive step-up recompute over the real battery") {
    val zs = Audits.q99MannWhitney(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(4)))
    val m = zs.length
    val sorted = zs.map { case (n, z) => (n, asP(z)) }.sortBy(p => (p._2, p._1))
    val kStar = sorted.zipWithIndex
      .filter { case ((_, p), i) => p <= (i + 1).toDouble * 0.05 / m }
      .map(_._2 + 1).maxOption.getOrElse(0)
    val got = Audits.q109BhFdr(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(3), r.getLong(6), r.getBoolean(7)))
    assert(got.length == m)
    assert(got.map(_._1).toSeq == sorted.map(_._1).toSeq, "p-ascending order")
    assert(got.forall(_._3 == kStar.toLong), s"k_star $kStar")
    assert(got.forall(r => r._4 == (r._2 <= kStar)), "discovery = rank <= k_star")
  }

  test("q109 step-up rejects a rank above its own threshold when a later rank passes") {
    // z's inverted from target p ~ [0.012, 0.030, 0.036, 0.9]:
    // thresholds at m=4, alpha=.05 are [0.0125, 0.025, 0.0375, 0.05] —
    // rank 2 fails ITS threshold (0.030 > 0.025) but rank 3 passes
    // (0.036 <= 0.0375), so k* = 3 and rank 2 is STILL a discovery
    val s = spark; import s.implicits._
    val tests = Seq(("t1", 2.512), ("t2", 2.170), ("t3", 2.097), ("t4", 0.1257))
      .toDF("n_name", "z")
    val got = Audits.bhFdrFrom(tests).collect()
      .map(r => (r.getString(0), r.getInt(3), r.getDouble(2), r.getLong(6), r.getBoolean(7)))
    assert(got.map(_._1).toSeq == Seq("t1", "t2", "t3", "t4"))
    assert(got.forall(_._4 == 3L), s"k_star must be 3: $got")
    assert(got.map(_._5).toSeq == Seq(true, true, true, false))
    val p2 = got(1)._3
    assert(p2 > 2.0 * 0.05 / 4.0, "the planted rank-2 p must exceed its own threshold")
  }

  // ---------------------------------------------------------------- q110
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private val poisCdf = Seq(0.36787944117144233, 0.7357588823428847,
    0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
    0.9994058151824183, 0.9999167588507119, 0.9999897508033253)

  test("q110 matches a naive Poisson-bootstrap replay") {
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .selectExpr("n_name", "o_orderkey",
        "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = base.groupBy(_._1).map { case (nation, rows) =>
      val m6s = (1 to 32).flatMap { b =>
        var sw = 0L; var swx = BigInt(0)
        for ((_, key, cents) <- rows) {
          val u = (h60(s"$key:$b:110").toDouble + 0.5) / 1152921504606846976.0
          val w = poisCdf.count(u > _).toLong
          sw += w; swx += BigInt(w) * cents
        }
        if (sw > 0) Some(math.floor(swx.toDouble / sw * 1e6 + 0.5).toLong) else None
      }
      val b = m6s.length
      val s1 = m6s.sum.toDouble
      val s2 = m6s.map(m => BigInt(m) * m).sum.toDouble
      val se = math.sqrt((s2 - s1 * s1 / b) / (b - 1)) / 1e6 / 100.0
      nation -> (rows.length.toLong, b.toLong,
        rows.map(_._3).sum.toDouble / rows.length / 100.0,
        se, m6s.min / 1e6 / 100.0, m6s.max / 1e6 / 100.0)
    }
    val got = Audits.q110BootstrapCi(spark, dir).collect()
    assert(got.length == naive.size)
    for (r <- got) {
      val (n, b, mean, se, lo, hi) = naive(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == b, s"${r.getString(0)} counts")
      assert(math.abs(r.getDouble(3) - mean) < 1e-3, s"${r.getString(0)} mean")
      assert(math.abs(r.getDouble(4) - se) < 1e-5, s"${r.getString(0)} se")
      assert(math.abs(r.getDouble(5) - lo) < 1e-5 && math.abs(r.getDouble(6) - hi) < 1e-5,
        s"${r.getString(0)} ci")
      assert(r.getDouble(5) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(6),
        "point estimate inside the bootstrap interval")
    }
  }

  // ---------------------------------------------------------------- q111
  test("q111 matches a naive permutation replay") {
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .selectExpr("n_name", "o_orderkey",
        "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents",
        "CAST(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS BIGINT) AS is_a")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val space = BigInt(1) << 60
    val naive = base.groupBy(_._1).flatMap { case (nation, rows) =>
      val nA = rows.count(_._4 == 1L).toLong
      val nB = rows.length - nA
      if (nA < 2 || nB < 2) None else {
        def snap6(x: Double): Long = math.abs(math.floor(x * 1e6 + 0.5)).toLong
        val obs6 = snap6(
          rows.filter(_._4 == 1L).map(_._3).sum.toDouble / nA
            - rows.filter(_._4 == 0L).map(_._3).sum.toDouble / nB)
        val n = rows.length.toLong
        val d6s = (1 to 64).flatMap { b =>
          var pa = 0L; var psa = 0L; var pb = 0L; var psb = 0L
          for ((_, key, cents, _) <- rows) {
            val toA = BigInt(h60(s"$key:$b:111")) * n < space * nA
            if (toA) { pa += 1; psa += cents } else { pb += 1; psb += cents }
          }
          if (pa > 0 && pb > 0)
            Some(snap6(psa.toDouble / pa - psb.toDouble / pb)) else None
        }
        val nGe = d6s.count(_ >= obs6).toLong
        Some(nation -> (nA, nB, obs6, d6s.length.toLong, nGe))
      }
    }.toMap
    val got = Audits.q111PermutationTest(spark, dir).collect()
    assert(got.length == naive.size)
    for (r <- got) {
      val (nA, nB, obs6, nReps, nGe) = naive(r.getString(0))
      assert(r.getLong(1) == nA && r.getLong(2) == nB, s"${r.getString(0)} sizes")
      assert(math.abs(r.getDouble(3) - obs6 / 1e6 / 100.0) < 1e-5, s"${r.getString(0)} obs")
      assert(r.getLong(4) == nReps && r.getLong(5) == nGe,
        s"${r.getString(0)} replicate counts: got (${r.getLong(4)}, ${r.getLong(5)}) want ($nReps, $nGe)")
      assert(math.abs(r.getDouble(6) - (nGe + 1.0) / (nReps + 1.0)) < 1e-6)
    }
  }

  test("q111 fully separated groups reach the smallest attainable p-value") {
    // group A = 1000x group B values: no relabeling can reproduce the
    // observed gap, so n_ge = 0 and p = 1/(B+1) exactly
    val s = spark; import s.implicits._
    val base = ((1L to 60L).map(k => ("X", k, 100000000L + k, 1L)) ++
      (61L to 120L).map(k => ("X", k, 100L + k, 0L)))
      .toDF("n_name", "o_orderkey", "cents", "is_a")
    val r = Audits.permutationTestFrom(base).collect().head
    assert(r.getLong(5) == 0L, s"no replicate may match the planted gap, n_ge=${r.getLong(5)}")
    assert(math.abs(r.getDouble(6) - 1.0 / 65.0) < 1e-6)
  }

  test("q110 collapses to a zero-width interval on a constant column") {
    // every replicate mean of a constant is the constant: se = 0 and
    // ci_lo = ci_hi = mean, whatever the weights drawn
    val s = spark; import s.implicits._
    val base = (1L to 200L).map(k => ("X", k, 12345L)).toDF("n_name", "o_orderkey", "cents")
    val r = Audits.bootstrapCiFrom(base).collect().head
    assert(r.getDouble(3) == 123.45)
    assert(r.getDouble(4) == 0.0, "bootstrap SE of a constant must be exactly 0")
    assert(r.getDouble(5) == 123.45 && r.getDouble(6) == 123.45)
  }
}
