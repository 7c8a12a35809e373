package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Sampling, TextOps}

/** Semantics of the round-7b operators: binned quantile sketch (q54),
  * multi-distinct aggregate (q55), bigram LM scoring (t61), PII
  * redaction (t62), mixture resampling (d52).
  */
class Round7bSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  // ---- q54 ----------------------------------------------------------

  private val BinDollars = 655.36 // 65536 cents

  test("q54 estimates are within one bin of the exact order statistics") {
    import spark.implicits._
    val est = Relational.q54QuantileSketch(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val byFlag = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice").as[(String, Double)]
      .collect().groupBy(_._1).map { case (f, a) => f -> a.map(_._2).sorted }
    val qs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p95", 19L, 20L))
    for ((flag, vals) <- byFlag; (qn, num, den) <- qs) {
      val n = vals.length
      val (gotN, gotEst) = est((flag, qn))
      assert(gotN == n.toLong, s"$flag/$qn: n")
      val pos = num.toDouble * (n - 1) / den // 0-based continuous rank
      val vf = vals(math.floor(pos).toInt)
      val vc = vals(math.ceil(pos).toInt)
      val exact = vf + (pos - math.floor(pos)) * (vc - vf)
      // est sits in the bin of the bracketing order statistic v_ceil …
      assert(math.abs(gotEst - vc) <= BinDollars + 1e-6,
        s"$flag/$qn: |$gotEst - v_ceil $vc| > bin width")
      // … and vs the interpolated exact quantile the bound widens by at
      // most the inter-rank gap (zero on dense data)
      assert(math.abs(gotEst - exact) <= BinDollars + (vc - vf) + 1e-6,
        s"$flag/$qn: |$gotEst - exact $exact| out of bound")
    }
  }

  // ---- q55 ----------------------------------------------------------

  test("q55 matches a direct recomputation and plans via Expand") {
    import spark.implicits._
    val got = Relational.q55MultiDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val rows = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_partkey", $"l_suppkey", $"l_discount", $"l_extendedprice")
      .as[(String, Long, Long, Double, Double)].collect()
    for ((flag, parts, supps, n, discRev) <- got) {
      val g = rows.filter(_._1 == flag)
      assert(parts == g.map(_._2).distinct.length.toLong, s"$flag parts")
      assert(supps == g.map(_._3).distinct.length.toLong, s"$flag supps")
      assert(n == g.length.toLong, s"$flag n")
      val want = g.filter(_._4 > 0.05)
        .map(t => math.floor(t._5 * 100 + 0.5).toLong).sum / 100.0
      assert(math.abs(discRev - want) < 1e-6, s"$flag disc_rev $discRev != $want")
    }
    // two different COUNT(DISTINCT) columns force the Expand-based
    // multi-distinct rewrite — one shuffle, no per-column re-scan
    val plan = Relational.q55MultiDistinct(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "multi-distinct should plan via Expand")
  }

  // ---- t61 ----------------------------------------------------------

  test("t61 bigram counts and gate are consistent; scores discriminate") {
    import spark.implicits._
    val got = TextOps.t61LmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getBoolean(3)))
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(got.length == toks.size, "one row per document")
    for ((id, nb, avg, keep) <- got) {
      assert(nb == math.max(toks(id) - 1, 0L), s"doc $id: n_bigrams")
      assert(avg < 0.0, s"doc $id: smoothed logprob must be negative")
      // gate ⇔ threshold (boundary rows within 1e-5 of −4.0 are exempt:
      // `keep` is decided on unrounded integer nanos)
      if (math.abs(avg + 4.0) > 1e-5)
        assert(keep == (avg >= -4.0), s"doc $id: keep vs avg $avg")
    }
    val scores = got.map(_._3).filterNot(_.isNaN)
    assert(scores.min < scores.max, "scores must discriminate between docs")
  }

  // ---- t62 ----------------------------------------------------------

  test("t62 redaction kernel: planted strings, edges, idempotence") {
    import spark.implicits._
    val planted = Seq(
      "contact a@b.com and c@d.org now",          // two emails
      "x@y.io",                                   // whole string is PII
      "mail @nodomain stays put",                 // @ without local/domain
      "srv at 1.2.3.4 and 10.255.0.1!",           // two IPs, punct edge
      "999.999.999.999 is syntactically an IP",   // syntactic, not semantic
      "call +1-555-0042 or +1-555-9999",          // two phones
      "all: u5@m.com 10.0.5.35 +1-555-0001 end")
    val out = planted.toDF("s")
      .select(TextOps.redact(col("s")).as("r"),
        TextOps.redact(TextOps.redact(col("s"))).as("rr"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val red = out.map(_._1)
    assert(red(0) == "contact <EMAIL> and <EMAIL> now")
    assert(red(1) == "<EMAIL>")
    assert(red(2) == "mail @nodomain stays put")
    assert(red(3) == "srv at <IP> and <IP>!")
    assert(red(4) == "<IP> is syntactically an IP")
    assert(red(5) == "call <PHONE> or <PHONE>")
    assert(red(6) == "all: <EMAIL> <IP> <PHONE> end")
    // idempotence: a second pass finds nothing new
    assert(out.forall { case (r, rr) => r == rr }, "redaction must be idempotent")
  }

  test("t62 query redacts every derived line completely") {
    val rows = TextOps.t62PiiRedact(spark, dir).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(rows.nonEmpty)
    for ((ne, ni, np, red) <- rows) {
      assert(ne == 1 && ni == 1 && np == 1, "each derived line has one of each")
      assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
      assert(!red.contains("@"), "no raw email survives")
    }
  }

  // ---- d52 ----------------------------------------------------------

  test("d52 apportionment: quotas hit the budget, weights respected, deterministic") {
    // sf0.01: 20 sources × 25 docs — no source cap binds, so the
    // largest-remainder seats must make quotas sum to exactly 203
    val d = "/root/testdata/sf0.01"
    val rows = Sampling.d52MixtureSample(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val bySource = rows.groupBy(_._1)
    val quotas = bySource.map { case (s, rs) =>
      assert(rs.map(_._2).distinct.length == 1, s"$s: one quota per source")
      s -> rs.head._2
    }
    assert(quotas.values.sum == 203L, "quotas must sum to the budget")
    for ((s, rs) <- bySource) {
      assert(rs.length.toLong == quotas(s), s"$s: delivered == quota")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, s"$s: dense ranks")
    }
    // weight w = 1 + srcnum % 4 ⇒ quota is 4w or 4w+1 at these counts
    for ((s, q) <- quotas) {
      val w = 1 + s.drop(3).toInt % 4
      assert(q == 4L * w || q == 4L * w + 1, s"$s: quota $q vs weight $w")
    }
    val again = Sampling.d52MixtureSample(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq, "sample must be a pure function of the data")
  }
}
