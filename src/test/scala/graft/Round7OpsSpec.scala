package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, EventWindows, Relational, Sampling, TextOps}

/** Semantics of the round-7 operators: gap-fill (q52), full-outer
  * snapshot diff (q53), BM25 (t59), CMS heavy hitters (t60),
  * edit-distance near-dup (d50), weighted systematic sampling (d51).
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q52 spine is dense per type: every hour between bounds, no dups") {
    val rows = EventWindows.q52GapFill(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byType = rows.groupBy(_._1)
    assert(byType.nonEmpty)
    val hourUs = 3600L * 1000000
    for ((t, rs) <- byType) {
      val hours = rs.map(_._2).sorted
      assert(hours.distinct.length == hours.length, s"$t: duplicate hours")
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == hourUs },
        s"$t: spine has holes")
    }
    // filled rows are exactly the zero-count rows
    assert(rows.forall { case (_, _, n, filled) => (filled == 1) == (n == 0L) })
    // at least one gap was actually filled somewhere (else the op is vacuous)
    assert(rows.exists(_._4 == 1), "test data has no hour gaps — spine untested")
  }

  test("q52 forward-fill carries the last observed value across gaps") {
    val rows = EventWindows.q52GapFill(spark, dir)
      .select(col("event_type"), col("hour_us"), col("filled"), col("ff_sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    for ((_, rs) <- rows.groupBy(_._1)) {
      var lastObserved: Option[Double] = None
      for ((_, _, filled, ff) <- rs.sortBy(_._2)) {
        if (filled == 1) assert(ff == lastObserved, "gap row must carry prior value")
        else { assert(ff.isDefined); lastObserved = ff }
      }
    }
  }

  test("q53 classifies every 1995/1996 customer exactly once, deltas consistent") {
    val rows = Relational.q53SnapshotDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).distinct.length == rows.length, "one row per customer")
    assert(rows.forall { case (_, st, a, b, d) =>
      math.abs(d - (b - a)) < 1e-9 &&
        (st match {
          case "new"     => a == 0.0 && b > 0.0
          case "churned" => a > 0.0 && b == 0.0
          case "kept"    => a > 0.0 && b > 0.0
          case _         => false
        })
    })
    val byStatus = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(Set("new", "churned", "kept").subsetOf(byStatus.keySet),
      s"expected all three classes in test data: $byStatus")
    // the union of both yearly aggregates is exactly the output
    val o = Tables.orders(spark, dir)
    val expected = o.filter(year(col("o_orderdate")).isin(1995, 1996))
      .select(col("o_custkey")).distinct().count()
    assert(rows.length == expected)
  }

  test("t59 BM25 prefers rarer terms and penalizes long docs vs raw tf-idf") {
    val rows = TextOps.t59Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    // exactly 3 ranked terms per doc, scores strictly ordered per doc
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.values.forall(_.map(_._2).sorted.sameElements(Array(1, 2, 3))))
    assert(byDoc.values.forall { rs =>
      val s = rs.sortBy(_._2).map(_._5)
      s.zip(s.tail).forall { case (a, b) => a >= b }
    })
    assert(rows.forall(_._5 > 0.0), "BM25 scores of present terms are positive")
  }

  test("t60 CMS estimate never undercounts, and is exact for most heavy hitters") {
    val rows = TextOps.t60HeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    assert(rows.forall { case (_, n, est, over) => est >= n && over == est - n },
      "CMS must never undercount")
    // 4×256 grid vs a few-hundred-term vocabulary: collisions on the
    // heaviest 20 should be rare but the bound is what matters above
    assert(rows.count { case (_, n, est, _) => est == n } >= 10,
      s"suspiciously many collisions: ${rows.mkString(", ")}")
  }

  test("d50 confirms minhash candidates by relative edit distance") {
    val rows = Dedup.d50EditDistance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getInt(4), r.getDouble(5)))
    assert(rows.nonEmpty, "test corpus plants near-dups — d50 must find some")
    assert(rows.forall { case (a, b, dist, mx, rel) =>
      a < b && dist >= 0 && mx > 0 && rel <= 0.05 && math.abs(rel - dist.toDouble / mx) < 1e-6
    })
    // verification is strictly tighter than candidate generation
    val candidates = Dedup.d42MinhashLsh(spark, dir).count()
    assert(rows.length <= candidates)
  }

  test("d51 places exactly K weighted picks per stratum, heavy docs more likely") {
    val rows = Sampling.d51WeightedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySource = rows.groupBy(_._1)
    // systematic PPS: total picks per stratum is exactly K
    assert(bySource.values.forall(_.map(_._3).sum == 10),
      s"per-stratum pick totals: ${bySource.view.mapValues(_.map(_._3).sum).toMap}")
    // pick indices partition 0..K-1: consecutive, no overlap
    for ((_, rs) <- bySource) {
      val spans = rs.sortBy(_._2).map(r => (r._2, r._2 + r._3))
      assert(spans.head._1 == 0)
      assert(spans.zip(spans.tail).forall { case ((_, e), (s, _)) => s == e })
      assert(spans.last._2 == 10)
    }
    // determinism: a pure function of the data
    val again = Sampling.d51WeightedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == again.toSeq)
  }
}
