package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventWindows, Multimodal, Relational, Sampling, TextOps}

/** Semantics of the round-7 fifth batch: interval merge (q72), weighted
  * median (q73), mode (q74) — each checked against an independent naive
  * recomputation, not just the shared oracle SQL.
  */
class Round7eSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q72 merged spans equal a naive per-customer interval union") {
    val got = Relational.q72IntervalMerge(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val iv = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + 30L))
    assert(got.nonEmpty)
    for ((cust, rows) <- iv.groupBy(_._1)) {
      // naive sweep: sort by start and fold into disjoint spans
      val sorted = rows.map(r => (r._2, r._3)).sorted
      val spans = sorted.drop(1).foldLeft(List(sorted.head)) {
        case ((s, e) :: acc, (s2, e2)) =>
          if (s2 > e) (s2, e2) :: (s, e) :: acc
          else (s, math.max(e, e2)) :: acc
        case (acc, x) => x :: acc
      }
      val (nOrders, nSpans, covered, longest) = got(cust)
      assert(nOrders == rows.length, s"cust $cust n_orders")
      assert(nSpans == spans.length, s"cust $cust n_spans")
      assert(covered == spans.map(s => s._2 - s._1).sum, s"cust $cust covered")
      assert(longest == spans.map(s => s._2 - s._1).max, s"cust $cust longest")
    }
  }

  test("q72 spans are genuinely merged (some customer has overlapping orders)") {
    // non-vacuity: with 30-day intervals and ~10 orders/customer over a
    // few years, merges must occur — n_spans < n_orders for someone
    val rows = Relational.q72IntervalMerge(spark, dir).collect()
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
    // and coverage never exceeds n_spans * interval upper bound
    assert(rows.forall(r => r.getLong(3) >= 30L && r.getLong(3) <= r.getLong(1) * 30L))
  }

  test("q73 weighted median halves the weight mass on each side") {
    val rows = Relational.q73WeightedMedian(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 3)
    val raw = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"),
        floor(col("l_quantity") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((flag, med, total) <- rows) {
      val grp = raw.filter(_._1 == flag)
      assert(total == grp.map(_._3).sum)
      val below = grp.filter(_._2 < med).map(_._3).sum
      val upTo = grp.filter(_._2 <= med).map(_._3).sum
      // defining property of the lower weighted median
      assert(2 * upTo >= total, s"$flag: mass up to median")
      assert(2 * below < total, s"$flag: mass strictly below")
    }
  }

  test("q75 ACF matches a naive per-series Pearson over lagged pairs") {
    val got = EventWindows.q75Autocorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"),
        floor(col("value") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toSeq
      .map { case ((et, day), v) => (et, day, v) }
    for ((et, series) <- daily.groupBy(_._1); k <- 1 to 3) {
      val s = series.sortBy(_._2).map(_._3)
      val pairs = s.drop(k).zip(s.dropRight(k)) // (v, v_lagged_k)
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxy = pairs.map(p => p._1.toDouble * p._2).sum
      val sxx = pairs.map(p => p._1.toDouble * p._1).sum
      val syy = pairs.map(p => p._2.toDouble * p._2).sum
      val r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (nGot, rGot) = got((et, k.toLong))
      assert(nGot == pairs.length, s"$et lag $k n")
      assert(math.abs(rGot - r) < 1e-9, s"$et lag $k acf $rGot vs $r")
      assert(rGot >= -1.0 && rGot <= 1.0)
    }
  }

  test("q76 session summary agrees with q16's native session_window sessions") {
    // same 6h gap semantics through two different engine paths: the
    // native session_window operator (q16) and the window-function
    // islands formulation (q76) must partition events identically
    val native = EventWindows.q16SessionWindow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))) // (user, n_events per session)
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum,
        v.map(_._2).max)).toMap
    val got = EventWindows.q76SessionSummary(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == native.keySet)
    for ((u, (ns, ne, mx)) <- got) {
      assert(native(u) == ((ns, ne, mx)), s"user $u sessions")
    }
  }

  test("t65 PMI matches a naive count-based recomputation; floor respected") {
    val rows = TextOps.t65PmiCollocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 20)
    assert(rows.forall(_._3 >= 5L), "min-count floor")
    val docs = Tables.documents(spark, dir).select(col("text")).collect()
      .map(_.getString(0).split(" ").toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = docs.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tTotal = docs.map(_.length.toLong).sum
    val pTotal = docs.map(t => (t.length - 1).toLong).sum
    for ((w1, w2, c12, c1, c2, pmiN) <- rows) {
      assert(pairCounts((w1, w2)) == c12 && uni(w1) == c1 && uni(w2) == c2)
      val want = math.floor(math.log(
        c12.toDouble * tTotal.toDouble * tTotal.toDouble
          / (pTotal.toDouble * c1.toDouble * c2.toDouble)) * 1e9 + 0.5).toLong
      assert(pmiN == want, s"($w1,$w2)")
    }
    // ordering is the declared total order
    assert(rows.zip(rows.drop(1)).forall { case (a, b) =>
      a._6 > b._6 || (a._6 == b._6 && (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)))
    })
    // and nothing outside the top-20 beats the last row (completeness)
    val minShown = rows.last._6
    val all = pairCounts.filter(_._2 >= 5).map { case ((w1, w2), c12) =>
      math.floor(math.log(c12.toDouble * tTotal.toDouble * tTotal.toDouble
        / (pTotal.toDouble * uni(w1).toDouble * uni(w2).toDouble)) * 1e9 + 0.5).toLong
    }
    assert(all.count(_ > minShown) < 20)
  }

  test("d56 split is a disjoint exhaustive hash partition with stable counts") {
    val got = Sampling.d56SplitAssign(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val total = got.map(_._3).sum
    assert(total == Tables.documents(spark, dir).count())
    // per-doc independent re-derivation: every doc lands in exactly one
    // split and per-(source, split) counts agree
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val space = BigInt(1) << 60
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val h = BigInt(hex, 16)
      if (h < space * 8 / 10) "train" else if (h < space * 9 / 10) "val" else "test"
    }
    val want = docs.groupBy(d => (d._2, splitOf(d._1))).view.mapValues(_.length.toLong)
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want.toMap)
    // rough proportions hold globally (hash uniformity at n=500)
    val bySplit = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit("train") > total * 7 / 10 && bySplit("train") < total * 9 / 10)
    assert(bySplit("val") + bySplit("test") < total * 3 / 10)
  }

  test("m66 clusters are the union-find closure of the hamming-filtered pairs") {
    val pairs = Multimodal.m64PhashCandidates(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kept = pairs.filter(_._3 <= 20L).map(p => (p._1, p._2))
    val dropped = pairs.filter(_._3 > 20L)
    assert(kept.nonEmpty && dropped.nonEmpty, "bar must split the candidates")
    // naive union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- kept) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = Multimodal.m66PhashClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == want.keySet)
    for ((id, cl, n, keep) <- got) {
      assert(cl == want(id), s"cluster of $id")
      assert(n == want.values.count(_ == cl), s"size of cluster $cl")
      assert(keep == (if (id == cl) 1L else 0L))
    }
    // exactly one keeper per cluster
    assert(got.filter(_._4 == 1L).map(_._2).toSet == got.map(_._2).toSet)
  }

  test("q77 sketch estimates sit within KMV error bounds of the exact sets") {
    val r = Relational.q77KmvSetOps(spark, dir).collect()(0)
    val (estA, estB, estU, estI, estJ) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val keys = Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderstatus"), col("o_custkey")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val a = keys.filter(_._1 == "O").map(_._2).toSet
    val b = keys.filter(_._1 == "F").map(_._2).toSet
    // k=64 → σ ≈ 1/√62 ≈ 12.7%; 0.4 is > 3σ — a deterministic pass on
    // this fixed corpus, checked as a real accuracy claim
    def close(est: Double, exact: Int): Unit =
      assert(math.abs(est - exact) <= 0.4 * exact, s"$est vs $exact")
    close(estA, a.size); close(estB, b.size); close(estU, (a ++ b).size)
    // inclusion–exclusion intersection compounds three errors
    assert(math.abs(estI - a.intersect(b).size) <= 0.6 * a.intersect(b).size)
    assert(estJ >= 0.0 && estJ <= 1.3)
  }

  test("q78 bucketed attribution equals the naive per-user interval join") {
    val got = EventWindows.q78AttributionJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = e.groupBy(_._1)
    val purchasers = byUser.filter(_._2.exists(_._2 == "purchase"))
    assert(got.keySet == purchasers.keySet)
    var anyPair = false
    for ((u, evs) <- purchasers) {
      val ps = evs.filter(_._2 == "purchase")
      val cs = evs.filter(_._2 == "click")
      val pairs = for {
        p <- ps; c <- cs
        if c._3 >= p._3 - 86400000000L && c._3 <= p._3
      } yield (p._4, c._4)
      val (np, na, npair) = got(u)
      assert(np == ps.length)
      assert(na == pairs.map(_._1).distinct.length, s"user $u attributed")
      assert(npair == pairs.length, s"user $u pairs")
      anyPair ||= pairs.nonEmpty
    }
    assert(anyPair, "window must attribute something on this corpus")
    // the plan is the bucketed equi-join — never a cartesian/nested-loop
    val plan = EventWindows.q78AttributionJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("q74 mode is the max-count value with (count desc, value asc) ties") {
    val rows = Relational.q74Mode(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val raw = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        floor(col("l_quantity") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((flag, status, modeQty, modeCount) <- rows) {
      val counts = raw.filter(r => r._1 == flag && r._2 == status)
        .groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val best = counts.toSeq.sortBy { case (v, n) => (-n, v) }.head
      assert((modeQty, modeCount) == best, s"$flag/$status")
    }
  }
}
