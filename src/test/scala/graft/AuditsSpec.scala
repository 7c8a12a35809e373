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
}
