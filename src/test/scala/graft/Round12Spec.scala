package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audits, Curation, Dedup, Graph, Multimodal, Temporal, TextOps}

/** Semantics of the round-12 additions: q113 Spearman against a naive
  * driver-side average-rank + Pearson recompute, q114 DP counts against
  * the Laplace mechanism's defining properties (domain completion,
  * deterministic seeded noise, exact true counts underneath), and q115
  * HITS against a naive driver-side recompute of the identical integer
  * fixed-point iteration. The DuckDB hash gate covers cross-engine
  * equality; these pin MEANING.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q113
  test("q113 Spearman matches a naive average-rank Pearson recompute") {
    val rows = Tables.lineitem(spark, dir)
      .select(
        floor(col("l_quantity") + lit(0.5)).cast("long"),
        floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"),
        floor(col("l_discount") * lit(100.0) + lit(0.5)).cast("long"),
        floor(col("l_tax") * lit(100.0) + lit(0.5)).cast("long"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // naive average ranks per column (1-based, ties → mean of positions)
    def avgRanks(vs: Seq[Long]): Seq[Double] = {
      val byVal = vs.groupBy(identity).view.mapValues(_.size).toMap
      val cumLess = {
        var c = 0L
        byVal.keys.toSeq.sorted.map { v => val r = c; c += byVal(v); v -> r }.toMap
      }
      vs.map(v => cumLess(v) + (byVal(v) + 1) / 2.0)
    }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val saa = a.map(x => x * x).sum
      val sbb = b.map(x => x * x).sum
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    val ranks = (0 to 3).map(i => avgRanks(rows.map(_(i)).toSeq))
    val got = Audits.q113Spearman(spark, dir).collect()
    assert(got.length == 1)
    val row = got.head
    assert(row.getLong(0) == rows.length)
    val pairs = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    pairs.zipWithIndex.foreach { case ((i, j), k) =>
      val want = pearson(ranks(i), ranks(j))
      val gotRho = row.getDouble(1 + k)
      assert(math.abs(gotRho - want) < 1e-9, s"pair ($i,$j): got $gotRho want $want")
      assert(gotRho >= -1.0 - 1e-12 && gotRho <= 1.0 + 1e-12)
    }
  }

  test("q113 detects a planted perfect monotone association") {
    // quantity and price perfectly co-monotone → rho = 1 on that pair
    val d = java.nio.file.Files.createTempDirectory("graft-spearman").toString
    val s = spark; import s.implicits._
    (1 to 50).map(i => (i.toDouble, i * 10.0 + 0.5, (i % 3) * 0.01, 0.05))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val row = Audits.q113Spearman(spark, d).collect().head
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12, "rho_qv_pv must be 1")
    // constant tax column → zero variance → null, not NaN
    assert(row.isNullAt(3), "rho_qv_tv on a constant column must be null")
  }

  // ---------------------------------------------------------------- q114
  test("q114 completes the domain, keeps exact counts, and is deterministic") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts").cast("date").as("day"))
    val nTypes = ev.select("event_type").distinct().count()
    val nDays = ev.select("day").distinct().count()
    val out = Audits.q114DpCounts(spark, dir).collect()
    assert(out.length == nTypes * nDays, "full type × day grid released")
    // true counts are exact
    val want = ev.groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    out.foreach { r =>
      val k = (r.getString(0), r.getDate(1).toString)
      assert(r.getLong(2) == want.getOrElse(k, 0L), s"true count at $k")
      // Laplace(b=2) noise: |noise| = 2·ln(1/(2·min(u,1-u))) ≤ 2·60·ln2 ≈ 83.2
      val noise = r.getDouble(3) - r.getLong(2)
      assert(math.abs(noise) <= 2.0 * 60 * math.log(2.0) + 1e-6, s"noise bound at $k")
    }
    // seeded noise: a second run is bit-identical
    val again = Audits.q114DpCounts(spark, dir).collect()
    assert(out.map(_.getDouble(3)).toSeq == again.map(_.getDouble(3)).toSeq)
    // and the noise is not degenerate (some cell actually perturbed)
    assert(out.exists(r => r.getDouble(3) != r.getLong(2).toDouble))
  }

  // ---------------------------------------------------------------- q115
  test("q115 HITS matches a naive driver-side fixed-point recompute") {
    val S = 1000000000000L
    val e = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parts = e.map(_._2).distinct.sorted
    var a = parts.map(p => p -> S / parts.length).toMap
    for (_ <- 1 to 2) {
      val hRaw = e.groupBy(_._1).view.mapValues(_.map(x => a(x._2)).sum).toMap
      val ht = hRaw.values.map(BigInt(_)).sum
      val hs = (ht / S).toLong
      val h = hRaw.view.mapValues(_ / hs).toMap
      val aRaw = e.groupBy(_._2).view.mapValues(_.map(x => h(x._1)).sum).toMap
      val at = aRaw.values.map(BigInt(_)).sum
      val as = (at / S).toLong
      a = aRaw.view.mapValues(_ / as).toMap
    }
    val want = a.toSeq.sortBy { case (p, s) => (-s, p) }.take(100)
    val got = Graph.q115Hits(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want, "top-100 authorities must match the naive iteration exactly")
    // mass conservation: total authority stays within a factor of the grid
    val total = a.values.map(BigInt(_)).sum
    assert(total > BigInt(S) / 2 && total < BigInt(S) * 2, s"mass $total vs grid $S")
  }

  // ---------------------------------------------------------------- t82
  test("t82 Gopher rules: each planted violation trips exactly its rule") {
    val d = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    val s = spark; import s.implicits._
    val fifty = (1 to 48).map(_ => "word").mkString(" ") + " the a" // 50 words, 2 stopwords
    val docs = Seq(
      (1L, fifty, "en", "web", 0L),                                   // passes all
      (2L, "the a short doc", "en", "web", 0L),                       // word count < 50
      (3L, fifty.replaceAll("word", "iridescent###"), "en", "web", 0L), // hash ratio + mean len
      (4L, (1 to 48).map(_ => "xx").mkString(" ") + " the a", "en", "web", 0L), // mean len < 3
      (5L, (1 to 48).map(_ => "word...").mkString(" ") + " the a", "en", "web", 0L), // ellipsis
      (6L, (1 to 48).map(_ => "1234").mkString(" ") + " the a", "en", "web", 0L), // alpha < 80%
      (7L, (1 to 50).map(_ => "word").mkString(" "), "en", "web", 0L)) // no stopwords
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val out = TextOps.t82GopherRules(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): Seq[Int] = (3 to 8).map(out(id).getInt)
    assert(flags(1L) == Seq(1, 1, 1, 1, 1, 1) && out(1L).getInt(9) == 1)
    assert(out(2L).getInt(3) == 0 && out(2L).getInt(9) == 0, "short doc fails word count")
    assert(out(3L).getInt(5) == 0, "hash-heavy doc fails hash ratio")
    assert(out(4L).getInt(4) == 0, "2-char words fail mean length")
    assert(out(5L).getInt(6) == 0, "ellipsis-heavy doc fails ellipsis ratio")
    assert(out(6L).getInt(7) == 0, "digit words fail the alphabetic rule")
    assert(out(7L).getInt(8) == 0, "stopword-free doc fails the stopword rule")
  }

  // ---------------------------------------------------------------- t83
  test("t83 keyword tagging matches a naive recompute and never over-counts") {
    val dict = TextOps.topicTaxonomy.toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = docs.toSeq.flatMap { case (id, text) =>
      val toks: Seq[String] = text.split(" ", -1).toSeq
      val tagged: Seq[(Long, String)] =
        toks.flatMap(t => dict.get(t).map(topic => (id, topic)))
      tagged.groupBy(identity).toSeq.map { case ((i, topic), hits) =>
        (i, topic, hits.length.toLong,
          BigDecimal(hits.length.toDouble / toks.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(x => (x._1, x._2))
    val rows = TextOps.t83KeywordTags(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows == want, "per-(doc, topic) hits and coverage must match the naive tagger")
    assert(rows.forall(_._4 <= 1.0), "coverage is a fraction of the doc's tokens")
  }

  // ---------------------------------------------------------------- m69
  test("m69 aligns every frame to the active caption: cap = min(floor(t/130), last)") {
    val rows = Multimodal.m69CaptionAlign(spark, dir).collect()
    assert(rows.nonEmpty)
    // payload sizes drive the caption-track length
    val pb = Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 3)
      .select(col("doc_id"), length(col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (id, frameMs, capNo) = (r.getLong(0), r.getLong(2), r.getInt(3))
      val lastCap = math.ceil(pb(id) / 75.0).toInt - 1
      val wantCap = math.min(frameMs / 130L, lastCap.toLong)
      assert(capNo.toLong == wantCap, s"media $id frame_ms $frameMs")
      val lag = r.getLong(4)
      assert(lag >= 0, "active caption never starts after the frame")
      assert(lag < 130 || capNo == lastCap, "lag exceeds cadence only past the last caption")
    }
  }

  // ---------------------------------------------------------------- q116
  test("q116 k-core matches a naive driver-side peeling recompute") {
    val und = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.flatMap { grp =>
        val ps: Seq[Long] = grp.map(_._2).distinct.toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSet
    var e: Set[(Long, Long)] = und.flatMap(p => Seq(p, p.swap))
    val k = (e.size.toLong * 7) / (10 * e.map(_._1).size)
    var alive: Set[Long] = Set.empty
    for (_ <- 1 to 8) {
      val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      alive = deg.filter(_._2 >= k).keySet
      e = e.filter(p => alive(p._1) && alive(p._2))
    }
    val finalDeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = alive.toSeq.sorted.map(n => (n, finalDeg.getOrElse(n, 0L), k))
    val got = Graph.q116KCore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"peeling mismatch: got ${got.size} want ${want.size} rows")
    assert(got.nonEmpty, "k = 0.7·mean must not collapse the testdata core")
  }

  // ---------------------------------------------------------------- q117
  test("q117 split gains are non-negative and match a naive recompute") {
    val rows = Tables.events(spark, dir)
      .select(floor(col("value") * 100.0 + 0.5).cast("long"),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tn = rows.length.toDouble
    val tp = rows.map(_._2).sum.toDouble
    def gini(p: Double, n: Double) = { val q = p / n; 1.0 - q * q - (1.0 - q) * (1.0 - q) }
    val byV = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    var (cn, cp) = (0L, 0L)
    val cands = byV.keys.toSeq.sorted.flatMap { v =>
      cn += byV(v)._1; cp += byV(v)._2
      if (cn < tn) Some((v, cn, cp,
        BigDecimal(gini(tp, tn) - (cn / tn) * gini(cp.toDouble, cn.toDouble)
          - ((tn - cn) / tn) * gini(tp - cp, tn - cn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }
    val want = cands.sortBy(c => (-c._4, c._1)).take(5)
    val got = Audits.q117GiniSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // weighted child impurity never exceeds the parent's (concavity)
    assert(got.forall(_._4 >= -1e-9))
  }

  test("q117 finds a planted perfect split with gain = parent gini") {
    val d = java.nio.file.Files.createTempDirectory("graft-gini").toString
    val s = spark; import s.implicits._
    // value <= 5.00 → never purchase; value > 5.00 → always purchase
    val ev = (1 to 40).map(i => (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      i.toLong, if (i % 2 == 0) "purchase" else "click",
      if (i % 2 == 0) 7.0 + i * 0.01 else 3.0 + i * 0.01, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val top = Audits.q117GiniSplit(spark, d).collect().head
    // parent is 50/50 → gini 0.5; the boundary threshold separates perfectly
    assert(math.abs(top.getDouble(3) - 0.5) < 1e-9)
    // split is x <= t: the best threshold is the largest click-side value
    assert(top.getLong(0) == 339L)
    assert(top.getLong(1) == 20L && top.getLong(2) == 0L)
  }

  // ---------------------------------------------------------------- t84
  test("t84 winnowing matches a naive recompute on every sf0.001 doc") {
    val P = 999999999999989L
    def naive(text: String): (Long, Long, Long, Long) = {
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      val m = math.max(norm.length - 7, 1)
      val h = (1 to m).map { i =>
        (1 until 8).foldLeft(if (i <= norm.length) norm(i - 1).toLong else 0L) { (acc, k) =>
          val c = if (i + k <= norm.length) norm(i + k - 1).toLong else 0L
          (acc * 257L + c) % P
        }
      }
      val wc = math.max(m - 7, 1)
      val sel: IndexedSeq[(Int, Long)] = (1 to wc).map { j =>
        val win: Seq[Int] = (j to math.min(j + 7, m)).toSeq
        val mn = win.map(p => h(p - 1)).min
        (win.filter(p => h(p - 1) == mn).max, mn) // rightmost min
      }
      val flags = sel.indices.map(i => i == 0 || sel(i)._1 != sel(i - 1)._1)
      val digest = sel.indices.filter(i => flags(i)).map(i => BigInt(sel(i)._2)).sum % P
      (wc.toLong, flags.count(identity).toLong, digest.toLong, h.min)
    }
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = TextOps.t84Winnowing(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    texts.foreach { case (id, text) =>
      assert(got(id) == naive(text), s"doc $id")
    }
    // winnowing density: roughly 2/(w+1) of windows are recorded, never more
    // than one per window
    got.values.foreach { case (wcN, nFps, _, _) => assert(nFps >= 1 && nFps <= wcN) }
  }

  // ---------------------------------------------------------------- q118
  test("q118 Shapley matches a naive permutation average and is efficient") {
    val channels = Seq("click", "error", "signup", "view")
    // replicate the path model: converted users' pre-purchase channel sets
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val convSets = byUser.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._4))
      val p = ordered.indexWhere(_._2 == "purchase")
      if (p < 0) None
      else Some(ordered.take(p).map(_._2).filter(channels.contains).toSet)
    }.toSeq
    def v(s: Set[String]): Long = convSets.count(_.subsetOf(s)).toLong
    // exact Shapley over all 24 orderings of the 4 channels
    val perms = channels.permutations.toSeq
    val phi = channels.map { ch =>
      val m = perms.map { p =>
        val before = p.takeWhile(_ != ch).toSet
        v(before + ch) - v(before)
      }.sum
      ch -> m.toDouble / perms.length
    }.toMap
    val rows = graft.operators.EventWindows.q118ShapleyAttribution(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    channels.foreach { ch =>
      assert(math.abs(rows(ch)._1 - phi(ch)) < 5e-7, s"$ch: ${rows(ch)._1} vs ${phi(ch)}")
    }
    // efficiency: Σφ = v(N) − v(∅) exactly on the 1/24 grid
    val tot = phi.values.sum
    assert(math.abs(tot - (v(channels.toSet) - v(Set.empty))) < 1e-9)
    // shares sum to ~1 when any credit exists
    if (tot > 0) assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-5)
  }

  // ---------------------------------------------------------------- c86
  test("c86 column stats agree with the buffered percentile aggregate") {
    val rows = graft.operators.Storage.c86ColumnStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("l_extendedprice", "l_quantity"))
    val li = Tables.lineitem(spark, dir)
    val n = li.count()
    for ((cn, r) <- rows) {
      assert(r.getLong(1) == n)
      val exact = li.select(
        countDistinct(col(cn)), min(col(cn)).cast("double"), max(col(cn)).cast("double"),
        round(expr(s"percentile($cn, 0.25)"), 6), round(expr(s"percentile($cn, 0.5)"), 6),
        round(expr(s"percentile($cn, 0.75)"), 6), round(expr(s"percentile($cn, 0.95)"), 6))
        .collect().head
      assert(r.getLong(2) == exact.getLong(0), s"$cn ndv")
      assert(r.getDouble(3) == exact.getDouble(1) && r.getDouble(4) == exact.getDouble(2))
      // the slice-rank plan mirrors quantile_cont's lo + frac·(hi−lo)
      // algebra (the oracle gate pins THAT bit-for-bit); Spark's buffered
      // percentile interpolates as (1−frac)·lo + frac·hi, whose last-ulp
      // divergence can flip the 6-dp rounding — so this cross-check is
      // tolerance-based, not exact
      assert(Seq(5, 6, 7, 8).forall(i =>
        math.abs(r.getDouble(i) - exact.getDouble(i - 2)) < 2e-6),
        s"$cn quantiles: slice-rank plan must match the buffered aggregate")
    }
  }

  // ---------------------------------------------------------------- t82 stream
  test("t82 Gopher gate runs stateless on a stream, identical to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, (1 to 48).map(_ => "word").mkString(" ") + " the a"),
      (2L, "too short"))
    val input = MemoryStream[(Long, String)]
    val q = TextOps.gopherRulesFrom(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_gate")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        r.getLong(0) -> (3 to 9).map(r.getInt)
      val streamed = spark.table("gopher_gate").collect().map(key).toMap
      val batch = TextOps.gopherRulesFrom(docs.toDF("doc_id", "text"))
        .collect().map(key).toMap
      assert(streamed == batch)
      assert(streamed(1L).last == 1 && streamed(2L).last == 0)
    } finally q.stop()
  }

  // ---------------------------------------------------------------- q119
  test("q119 Brown-Forsythe matches a naive recompute and flags planted heteroscedasticity") {
    // naive recompute on the real data
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = Audits.q119Levene(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    for ((st, grp) <- rows.groupBy(_._1)) {
      val byP = grp.groupBy(_._2).view.mapValues(_.map(_._3).toSeq).toMap
      def med2(vs: Seq[Long]): Long = {
        val s = vs.sorted
        val pos = 0.5 * (s.length - 1)
        val lo = s(pos.toInt)
        val hi = s(math.min(pos.toInt + 1, s.length - 1))
        math.floor((lo + (pos - pos.toInt) * (hi - lo)) * 2 + 0.5).toLong
      }
      val z = byP.toSeq.flatMap { case (_, vs) =>
        val m2 = med2(vs); vs.map(v => math.abs(2 * v - m2).toDouble)
      }
      val zg = byP.toSeq.map { case (_, vs) =>
        val m2 = med2(vs); vs.map(v => math.abs(2 * v - m2).toDouble)
      }
      val n = z.length.toDouble
      val k = zg.length.toDouble
      val gm = z.sum / n
      val ssb = zg.map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
      val ssw = zg.map(g => { val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
      val f = (ssb / (k - 1)) / (ssw / (n - k))
      assert(math.abs(got(st)._3 - f) < 1e-4, s"$st: got ${got(st)._3} want $f")
      assert(got(st)._1 == grp.length && got(st)._2 == byP.size)
    }
    // planted heteroscedasticity: one priority with 100× the spread → huge F
    val d = java.nio.file.Files.createTempDirectory("graft-levene").toString
    val s = spark; import s.implicits._
    val tight = (1 to 50).map(i => (i.toLong, 1L, "O", 100.0 + (i % 5) * 0.01,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
    val wide = (1 to 50).map(i => (100L + i, 1L, "O", 100.0 + (i % 5) * 25.0,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "2-HIGH"))
    (tight ++ wide)
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val planted = Audits.q119Levene(spark, d).collect()
    assert(planted.length == 1 && planted.head.getDouble(3) > 50.0,
      "a 2500x variance ratio must produce a large Brown-Forsythe F")
  }

  // ---------------------------------------------------------------- t85
  test("t85 calibration matches a naive recompute from t75 scores × t82 labels") {
    val scores = graft.operators.TextOps.t75QualityClassifier(spark, dir)
      .select("doc_id", "score_n9").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = graft.operators.TextOps.t82GopherRules(spark, dir)
      .select("doc_id", "pass").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(scores.keySet == labels.keySet)
    val binned = scores.toSeq.map { case (id, s9) =>
      (math.min(s9 * 10 / 1000000000L, 9L), s9, labels(id))
    }.groupBy(_._1)
    val n = scores.size.toLong
    val gap9 = binned.values.map(g =>
      (BigInt(g.map(_._2).sum) - BigInt(g.map(_._3).sum) * 1000000000L).abs).sum
    val wantEce = BigDecimal((gap9.toDouble) / (1e9 * n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.operators.TextOps.t85Calibration(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet == binned.keySet)
    rows.foreach { r =>
      val g = binned(r.getLong(0))
      assert(r.getLong(1) == g.length)
      val conf = g.map(_._2).sum.toDouble / (1e9 * g.length)
      val acc = g.map(_._3).sum.toDouble / g.length
      assert(math.abs(r.getDouble(2) - conf) < 1e-6)
      assert(math.abs(r.getDouble(3) - acc) < 1e-6)
      assert(math.abs(r.getDouble(4) - math.abs(conf - acc)) < 1e-6)
      assert(r.getDouble(5) == wantEce, "ECE identical on every bucket row")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  // ---------------------------------------------------------------- c85
  test("c85 apportionment is exact and temperature favors small sources") {
    val rows = Curation.c85EpochSchedule(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val budget = rows.head._3
    assert(rows.forall(_._3 == budget))
    // largest-remainder apportionment: allocations sum EXACTLY to budget
    assert(rows.map(_._4).sum == budget)
    // α = 0.7 temperature: epochs (= alloc/n) non-increasing in source
    // size, up to the ±1-token apportionment granularity
    val byN = rows.sortBy(_._2)
    byN.sliding(2).foreach { case Array(smaller, larger) =>
      assert(smaller._5 + 1.0 / smaller._2 >= larger._5 - 1.0 / larger._2,
        s"${smaller._1} vs ${larger._1}: temperature must not favor the larger source")
    }
  }
  // ---------------------------------------------------------------- t86
  test("t86 AUC matches a naive midrank recompute on sf0.001") {
    val rows = TextOps.t86RocAuc(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10) // only populated score deciles appear
    val auc = rows.head.getDouble(4)
    assert(rows.forall(r => math.abs(r.getDouble(4) - auc) < 1e-12), "auc constant across rows")
    // naive: collect (score, pass), midrank AUC in driver Scala
    val scored = TextOps.t75QualityClassifier(spark, dir)
      .select(col("doc_id"), col("score_n9")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val passed = TextOps.t82GopherRules(spark, dir)
      .select(col("doc_id"), col("pass")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val xs = scored.toSeq.map { case (id, s) => (s, passed(id)) }.sortBy(_._1)
    val nPos = xs.count(_._2 == 1).toDouble
    val nNeg = xs.length - nPos
    // midranks over tie groups
    var i = 0; var rPos = 0.0
    while (i < xs.length) {
      var j = i
      while (j < xs.length && xs(j)._1 == xs(i)._1) j += 1
      val mid = (i + 1 + j).toDouble / 2.0 // avg of ranks i+1..j
      rPos += mid * (i until j).count(k => xs(k)._2 == 1)
      i = j
    }
    val want = (rPos - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
    assert(math.abs(auc - want) < 1e-6, s"auc $auc want $want")
    // ROC endpoints: lowest threshold bucket predicts everything positive
    val b0 = rows.minBy(_.getLong(0))
    assert(b0.getDouble(2) == 1.0 && b0.getDouble(3) == 1.0, "bucket-0 operating point is (1,1)")
  }

  test("t86 AUC hits 1 / 0 / 0.5 on planted separable, inverted, and all-tied frames") {
    import spark.implicits._
    def frame(ps: Seq[(Long, Int)]) = ps.toDF("score_n9", "pass")
    val sep = frame((1 to 50).map(i => (i + 1000L, if (i > 25) 1 else 0)))
    assert(TextOps.rocAucFrom(sep).head().getDouble(4) == 1.0)
    val inv = frame((1 to 50).map(i => (i + 1000L, if (i > 25) 0 else 1)))
    assert(TextOps.rocAucFrom(inv).head().getDouble(4) == 0.0)
    val tied = frame((1 to 40).map(i => (777L, i % 2)))
    assert(TextOps.rocAucFrom(tied).head().getDouble(4) == 0.5)
  }

  // ---------------------------------------------------------------- t87
  test("t87 agreement stats match a naive 2x2 recompute on sf0.001") {
    val keep = TextOps.t75QualityClassifier(spark, dir)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pass = TextOps.t82GopherRules(spark, dir)
      .select(col("doc_id"), col("pass")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val cells = keep.toSeq.map { case (id, k) => (k, pass(id)) }
    val n = cells.size.toDouble
    val n11 = cells.count(c => c._1 == 1 && c._2 == 1).toDouble
    val n00 = cells.count(c => c._1 == 0 && c._2 == 0).toDouble
    val n10 = cells.count(c => c._1 == 1 && c._2 == 0).toDouble
    val n01 = cells.count(c => c._1 == 0 && c._2 == 1).toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) / (n * n)
    val r = TextOps.t87GateAgreement(spark, dir).head()
    assert(r.getLong(0) == n.toLong && r.getLong(1) == n11.toLong
      && r.getLong(2) == n00.toLong && r.getLong(3) == n10.toLong
      && r.getLong(4) == n01.toLong)
    assert(math.abs(r.getDouble(5) - po) < 1e-6)
    assert(math.abs(r.getDouble(6) - (po - pe) / (1 - pe)) < 1e-6,
      s"kappa ${r.getDouble(6)} want ${(po - pe) / (1 - pe)}")
    assert(math.abs(r.getDouble(7) - (n10 - n01) * (n10 - n01) / (n10 + n01)) < 1e-3)
  }

  test("t87 kappa is exactly 1 on perfect agreement and ~0 on independence") {
    import spark.implicits._
    val perfect = (1 to 60).map(i => (i % 3 min 1, i % 3 min 1)).toDF("keep", "pass")
    val p = TextOps.gateAgreementFrom(perfect).head()
    assert(p.getDouble(5) == 1.0 && p.getDouble(6) == 1.0)
    // independent coin flips (deterministic interleave): kappa ~ 0
    val indep = (0 until 400).map(i => ((i / 2) % 2, i % 2)).toDF("keep", "pass")
    val q = TextOps.gateAgreementFrom(indep).head()
    assert(math.abs(q.getDouble(6)) < 1e-9, s"independent kappa ${q.getDouble(6)}")
    // symmetric discordance: McNemar 0; asymmetric: (b-c)^2/(b+c)
    assert(math.abs(q.getDouble(7)) < 1e-12)
  }

  // ---------------------------------------------------------------- q127
  test("q127 Kendall tau-b matches a naive cell-pair recompute on sf0.001") {
    val rows = Tables.lineitem(spark, dir)
      .select(floor(col("l_quantity") + lit(0.5)).cast("long"),
        floor(col("l_discount") * lit(100.0) + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toLong
    val h = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = h.toSeq
    var c = BigInt(0); var d = BigInt(0)
    for (((qa, da), ca) <- cells; ((qb, db), cb) <- cells if qb > qa) {
      if (db > da) c += BigInt(ca) * cb
      else if (db < da) d += BigInt(ca) * cb
    }
    val tq2 = rows.groupBy(_._1).values.map(g => { val m = g.size.toLong; BigInt(m) * (m - 1) }).sum
    val td2 = rows.groupBy(_._2).values.map(g => { val m = g.size.toLong; BigInt(m) * (m - 1) }).sum
    val n02 = BigInt(n) * (n - 1)
    val tau = (c - d).toDouble /
      math.sqrt((n02 - tq2).toDouble / 2.0 * ((n02 - td2).toDouble / 2.0))
    val r = Audits.q127KendallTau(spark, dir).head()
    assert(r.getLong(0) == n && r.getLong(1) == cells.length.toLong)
    assert(r.getLong(2) == c.toLong && r.getLong(3) == d.toLong)
    assert(math.abs(r.getDouble(4) - tau) < 1e-6, s"tau ${r.getDouble(4)} want $tau")
  }

  test("q127 hits ±1 on planted perfect concordance and inversion") {
    import spark.implicits._
    val con = (1L to 10L).map(i => (i, i)).toDF("q", "d")
    assert(Audits.kendallTauFrom(con).head().getDouble(4) == 1.0)
    val inv = (1L to 10L).map(i => (i, 11L - i)).toDF("q", "d")
    assert(Audits.kendallTauFrom(inv).head().getDouble(4) == -1.0)
  }

  // ---------------------------------------------------------------- q128
  test("q128 Wasserstein matches a naive ECDF-integral recompute on sf0.001") {
    val rows = Audits.eraSplitFrom(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Audits.q128Wasserstein(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((st, grp) <- rows.groupBy(_._1)) {
      val xs = grp.filter(_._3 == 1L).map(_._2).sorted
      val ys = grp.filter(_._3 == 0L).map(_._2).sorted
      val grid = (xs ++ ys).distinct.sorted
      var w1 = BigInt(0)
      for (i <- 0 until grid.length - 1) {
        val fa = xs.count(_ <= grid(i)).toLong
        val fb = ys.count(_ <= grid(i)).toLong
        w1 += (BigInt(fa) * ys.length - BigInt(fb) * xs.length).abs *
          (grid(i + 1) - grid(i))
      }
      val want = w1.toDouble / (xs.length.toLong * ys.length)
      val r = got(st)
      assert(r.getLong(1) == xs.length.toLong && r.getLong(2) == ys.length.toLong)
      assert(math.abs(r.getDouble(3) - want) < 1e-2, s"$st: ${r.getDouble(3)} want $want")
    }
  }

  test("q128 reads a pure location shift as exactly the shift size") {
    import spark.implicits._
    val a = (1L to 100L).map(v => ("g", v * 10L, 1L))
    val b = (1L to 100L).map(v => ("g", v * 10L + 37L, 0L))
    val r = Audits.wassersteinFrom((a ++ b).toDF("grp", "cents", "is_a")).head()
    assert(r.getDouble(3) == 37.0, s"shift-37 series: W1 ${r.getDouble(3)}")
    // identical distributions: zero transport
    val same = Audits.wassersteinFrom(
      ((1L to 50L).map(v => ("g", v, 1L)) ++ (1L to 50L).map(v => ("g", v, 0L)))
        .toDF("grp", "cents", "is_a")).head()
    assert(same.getDouble(3) == 0.0)
  }

  // ---------------------------------------------------------------- q129
  test("q129 Cramer-von Mises matches a naive pooled-ECDF recompute on sf0.001") {
    val rows = Audits.eraSplitFrom(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Audits.q129CramerVonMises(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((st, grp) <- rows.groupBy(_._1)) {
      val xs = grp.filter(_._3 == 1L).map(_._2).sorted
      val ys = grp.filter(_._3 == 0L).map(_._2).sorted
      val cnt = grp.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      var t = BigInt(0)
      for (v <- cnt.keys) {
        val fa = xs.count(_ <= v).toLong
        val fb = ys.count(_ <= v).toLong
        val d = BigInt(fa) * ys.length - BigInt(fb) * xs.length
        t += cnt(v) * d * d
      }
      val na = xs.length.toLong; val nb = ys.length.toLong; val nn = na + nb
      val want = t.toDouble / (na.toDouble * nb * nn * nn)
      val r = got(st)
      assert(r.getLong(1) == na && r.getLong(2) == nb)
      assert(math.abs(r.getDouble(3) - want) < 1e-6, s"$st: ${r.getDouble(3)} want $want")
    }
  }

  test("q129 is zero on identical samples and large under complete separation") {
    import spark.implicits._
    val same = ((1L to 50L).map(v => ("g", v, 1L)) ++ (1L to 50L).map(v => ("g", v, 0L)))
      .toDF("grp", "cents", "is_a")
    assert(Audits.cramerVonMisesFrom(same).head().getDouble(3) == 0.0)
    val sep = ((1L to 50L).map(v => ("g", v, 1L)) ++ (1L to 50L).map(v => ("g", v + 1000L, 0L)))
      .toDF("grp", "cents", "is_a")
    // disjoint supports: T approaches n/ (4 n) scale — just assert it is large
    assert(Audits.cramerVonMisesFrom(sep).head().getDouble(3) > 0.2)
  }

  // ---------------------------------------------------------------- q130
  test("q130 log-rank matches a naive risk-table recompute on sf0.001") {
    val e = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byU = e.groupBy(_._1)
    val dur = byU.flatMap { case (uid, evs) =>
      val clicks = evs.filter(_._2 == "click").map(_._3)
      if (clicks.isEmpty) None else {
        val c = clicks.min
        val ps = evs.filter(x => x._2 == "purchase" && x._3 >= c).map(_._3)
        val (end, obs) = if (ps.nonEmpty) (ps.min, 1L) else (evs.map(_._3).max, 0L)
        Some((uid % 2, (end - c) / 1000000L, obs))
      }
    }.toSeq
    // naive risk table on the pooled grid
    val times = dur.map(_._2).distinct.sorted
    var (o1, e9s, v9s) = (0L, BigInt(0), BigInt(0))
    var nSteps = 0L
    for (t <- times) {
      val nr = dur.count(_._2 >= t).toLong
      val n1r = dur.count(x => x._2 >= t && x._1 == 1L).toLong
      val d = dur.count(x => x._2 == t && x._3 == 1L).toLong
      val d1 = dur.count(x => x._2 == t && x._3 == 1L && x._1 == 1L).toLong
      if (d > 0) {
        nSteps += 1; o1 += d1
        e9s += BigInt(math.floor(d.toDouble * n1r / nr * 1e9 + 0.5).toLong)
        if (nr > 1)
          v9s += BigInt(math.floor(d.toDouble * (n1r.toDouble / nr)
            * (1.0 - n1r.toDouble / nr)
            * ((nr - d).toDouble / (nr - 1).toDouble) * 1e9 + 0.5).toLong)
      }
    }
    val r = Temporal.q130LogRank(spark, dir).head()
    assert(r.getLong(0) == nSteps && r.getLong(1) == o1)
    val wantZ = if (v9s > 0)
      BigDecimal((o1.toDouble - e9s.toDouble / 1e9) / math.sqrt(v9s.toDouble / 1e9))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    else 0.0
    assert(math.abs(r.getDouble(4) - wantZ) < 1e-9, s"z ${r.getDouble(4)} want $wantZ")
  }

  test("q130 is exactly zero on mirrored cohorts and detects a slower cohort") {
    import spark.implicits._
    // perfectly mirrored cohorts: every step has d1 = d/2, n1r = nr/2
    val sym = (1L to 40L).flatMap(i => Seq((0L, i, 1L), (1L, i, 1L)))
      .toDF("grp", "dur_s", "obs")
    val rs = Temporal.logRankFrom(sym).head()
    assert(rs.getDouble(4) == 0.0, s"symmetric cohorts: z ${rs.getDouble(4)}")
    // cohort 1 converts much later: at early steps its risk set is full
    // but its event count is zero, so O1 falls far below E1 and Z << 0
    val sep = ((1L to 40L).map(i => (0L, i, 1L)) ++
      (1L to 40L).map(i => (1L, i + 100L, 1L))).toDF("grp", "dur_s", "obs")
    val rz = Temporal.logRankFrom(sep).head()
    assert(rz.getDouble(4) < -3.0, s"separated cohorts: z ${rz.getDouble(4)}")
  }

  // ---------------------------------------------------------------- t88
  test("t88 average precision matches a naive block recompute on sf0.001") {
    val scored = TextOps.t75QualityClassifier(spark, dir)
      .select(col("doc_id"), col("score_n9")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val passed = TextOps.t82GopherRules(spark, dir)
      .select(col("doc_id"), col("pass")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val blocks = scored.toSeq.map { case (id, s) => (s, passed(id)) }
      .groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (s, rows) => (s, rows.length.toLong, rows.map(_._2).sum) }
    val nPos = blocks.map(_._3).sum
    var (all, tp, mass) = (0L, 0L, BigInt(0))
    for ((_, n, np) <- blocks) {
      all += n; tp += np
      mass += np * math.floor(tp.toDouble / all * 1e9 + 0.5).toLong
    }
    val want = BigDecimal(mass.toDouble / (1e9 * nPos))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = TextOps.t88AveragePrecision(spark, dir).head()
    assert(r.getLong(0) == nPos && r.getLong(1) == all - nPos)
    assert(math.abs(r.getDouble(3) - want) < 1e-9, s"ap ${r.getDouble(3)} want $want")
  }

  test("t88 hits 1 on perfect separation and prevalence on a constant score") {
    import spark.implicits._
    // positives strictly above negatives: every block precision is 1
    val sep = ((1L to 30L).map(i => (900000000L + i, 1L)) ++
      (1L to 70L).map(i => (100000000L + i, 0L))).toDF("score_n9", "pass")
    val rs = TextOps.averagePrecisionFrom(sep).head()
    assert(rs.getDouble(3) == 1.0, s"separable: ap ${rs.getDouble(3)}")
    // one tie block: AP = prevalence exactly
    val flat = ((1L to 25L).map(_ => (500000000L, 1L)) ++
      (1L to 75L).map(_ => (500000000L, 0L))).toDF("score_n9", "pass")
    val rf = TextOps.averagePrecisionFrom(flat).head()
    assert(rf.getDouble(3) == 0.25 && rf.getDouble(2) == 0.25,
      s"flat: ap ${rf.getDouble(3)} prevalence ${rf.getDouble(2)}")
  }

  // ---------------------------------------------------------------- c87
  test("c87 pairwise JSD matches a naive recompute on sf0.001") {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = toks.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    val got = Curation.c87DomainJsd(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == bySrc.size * (bySrc.size - 1) / 2)
    val srcs = bySrc.keys.toSeq.sorted
    for (i <- srcs.indices; j <- (i + 1) until srcs.length) {
      val (sa, sb) = (srcs(i), srcs(j))
      val (ca, cb) = (bySrc(sa), bySrc(sb))
      val (na, nb) = (ca.values.sum, cb.values.sum)
      def ln9(cx: Long, nx: Long, cy: Long, ny: Long): Long =
        math.floor(math.log((2.0 * cx * ny) / (cx.toDouble * ny + cy.toDouble * nx))
          * 1e9 + 0.5).toLong
      var tsum = BigInt(0); var (saM, sbM) = (0L, 0L); var nSh = 0L
      for (w <- ca.keySet.intersect(cb.keySet)) {
        nSh += 1; saM += ca(w); sbM += cb(w)
        tsum += BigInt(ca(w)) * nb * ln9(ca(w), na, cb(w), nb) +
          BigInt(cb(w)) * na * ln9(cb(w), nb, ca(w), na)
      }
      val num = tsum + (BigInt(2) * na * nb - BigInt(saM) * nb - BigInt(sbM) * na) *
        693147181L
      val want = BigDecimal(num.toDouble / (2.0 * na * nb * 1e9))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val r = got((sa, sb))
      assert(r.getLong(2) == nSh, s"$sa-$sb shared ${r.getLong(2)} want $nSh")
      assert(math.abs(r.getDouble(3) - want) < 1e-9,
        s"$sa-$sb jsd ${r.getDouble(3)} want $want")
    }
  }

  test("c87 is exactly 0 on identical domains and ln 2 on disjoint vocabularies") {
    import spark.implicits._
    val same = Seq(("a", "x", 7L), ("a", "y", 3L), ("b", "x", 7L), ("b", "y", 3L))
      .toDF("source", "w", "cnt")
    val rs = Curation.jsDivergenceFrom(same).head()
    assert(rs.getDouble(3) == 0.0, s"identical: jsd ${rs.getDouble(3)}")
    val disj = Seq(("a", "x", 5L), ("a", "y", 5L), ("b", "u", 4L), ("b", "v", 6L))
      .toDF("source", "w", "cnt")
    val rd = Curation.jsDivergenceFrom(disj).head()
    assert(rd.getLong(2) == 0L && rd.getDouble(3) == 0.693147,
      s"disjoint: jsd ${rd.getDouble(3)}")
  }

  // ---------------------------------------------------------------- q131
  test("q131 CMH matches a naive per-stratum recompute on sf0.001") {
    val rows = graft.Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => (r.getInt(0).toLong,
        if (r.getString(1) == "AUTOMOBILE") 1L else 0L,
        if (r.getDouble(2) > 0.0) 1L else 0L))
    var (oSum, e9s, v9s, ad9s, bc9s, nStr) = (0L, BigInt(0), BigInt(0), BigInt(0), BigInt(0), 0L)
    for ((_, grp) <- rows.groupBy(_._1)) {
      val a = grp.count(x => x._2 == 1L && x._3 == 1L).toLong
      val b = grp.count(x => x._2 == 1L && x._3 == 0L).toLong
      val c = grp.count(x => x._2 == 0L && x._3 == 1L).toLong
      val d = grp.count(x => x._2 == 0L && x._3 == 0L).toLong
      val n = a + b + c + d
      nStr += 1; oSum += a
      e9s += math.floor((a + b).toDouble * (a + c) / n * 1e9 + 0.5).toLong
      if (n > 1)
        v9s += math.floor(((a + b).toDouble * (c + d) / n)
          * ((a + c).toDouble * (b + d) / n) / (n - 1) * 1e9 + 0.5).toLong
      ad9s += math.floor(a.toDouble * d / n * 1e9 + 0.5).toLong
      bc9s += math.floor(b.toDouble * c / n * 1e9 + 0.5).toLong
    }
    val r = Audits.q131CmhTest(spark, dir).head()
    assert(r.getLong(0) == nStr && r.getLong(1) == oSum)
    val wantChi2 = BigDecimal((oSum.toDouble - e9s.toDouble / 1e9)
        * (oSum.toDouble - e9s.toDouble / 1e9) / (v9s.toDouble / 1e9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(3) - wantChi2) < 1e-9, s"chi2 ${r.getDouble(3)} want $wantChi2")
    val wantOr = BigDecimal(ad9s.toDouble / bc9s.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(4) - wantOr) < 1e-9, s"or ${r.getDouble(4)} want $wantOr")
  }

  test("q131 reads through a planted Simpson reversal and is exactly 0 under independence") {
    import spark.implicits._
    // within BOTH strata exposure helps (OR > 1); pooled it looks harmful
    def cells(st: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((st, 1L, 1L)) ++ Seq.fill(b)((st, 1L, 0L)) ++
        Seq.fill(c)((st, 0L, 1L)) ++ Seq.fill(d)((st, 0L, 0L))
    val simpson = (cells(1L, 81, 6, 234, 36) ++ cells(2L, 192, 71, 55, 25))
      .toDF("stratum", "e", "y")
    val rs = Audits.cmhFrom(simpson).head()
    assert(rs.getDouble(4) > 1.0, s"stratified OR ${rs.getDouble(4)} must exceed 1")
    val pooledOr = (273.0 * 61.0) / (77.0 * 289.0) // the misleading pooled read
    assert(pooledOr < 1.0 && rs.getDouble(4) > 1.2)
    // exact independence in every stratum: a = E exactly, chi2 snaps to 0
    val indep = (cells(1L, 25, 25, 25, 25) ++ cells(2L, 10, 10, 10, 10))
      .toDF("stratum", "e", "y")
    val ri = Audits.cmhFrom(indep).head()
    assert(ri.getDouble(3) == 0.0 && ri.getDouble(4) == 1.0)
  }

  // ---------------------------------------------------------------- q132
  test("q132 partial correlation matches a naive moment recompute on sf0.001") {
    val rows = graft.Tables.lineitem(spark, dir)
      .select(floor(col("l_quantity") + lit(0.5)).cast("long"),
        floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"),
        floor(col("l_discount") * lit(100.0) + lit(0.5)).cast("long"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(rows.length)
    def s(f: ((BigInt, BigInt, BigInt)) => BigInt): BigInt = rows.map(f).sum
    val (sx, sy, sz) = (s(_._1), s(_._2), s(_._3))
    val (sxx, syy, szz) = (s(t => t._1 * t._1), s(t => t._2 * t._2), s(t => t._3 * t._3))
    val (sxy, sxz, syz) = (s(t => t._1 * t._2), s(t => t._1 * t._3), s(t => t._2 * t._3))
    def r9(num: BigInt, daa: BigInt, dbb: BigInt): Long =
      math.floor(num.toDouble / math.sqrt(daa.toDouble * dbb.toDouble) * 1e9 + 0.5).toLong
    val (dxx, dyy, dzz) = (n * sxx - sx * sx, n * syy - sy * sy, n * szz - sz * sz)
    val rxy9 = r9(n * sxy - sx * sy, dxx, dyy)
    val rxz9 = r9(n * sxz - sx * sz, dxx, dzz)
    val ryz9 = r9(n * syz - sy * sz, dyy, dzz)
    val den2 = (1e18 - rxz9.toDouble * rxz9) * (1e18 - ryz9.toDouble * ryz9)
    val want = BigDecimal((rxy9.toDouble * 1e9 - rxz9.toDouble * ryz9) / math.sqrt(den2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Audits.q132PartialCorr(spark, dir).head()
    assert(r.getLong(0) == rows.length.toLong)
    assert(math.abs(r.getDouble(1) - BigDecimal(rxy9 / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(r.getDouble(4) - want) < 1e-9, s"rp ${r.getDouble(4)} want $want")
  }

  test("q132 is exactly 1 when y duplicates x and strips a planted confounder") {
    import spark.implicits._
    // y == x: r_xy = 1 and r_xz == r_yz, so the partial collapses to 1
    val dup = (1L to 60L).map(i => (i, i, (i * 7) % 13)).toDF("x", "y", "z")
    assert(Audits.partialCorrFrom(dup).head().getDouble(4) == 1.0)
    // x and y only comove through z (independent small noises on top):
    // the partial correlation given z must collapse toward zero while
    // the pooled correlation still reads strong
    val conf = (1L to 200L).map { i =>
      val z = i % 50
      (z + (if (i % 2 == 0) 3L else -3L), z + (i % 3), z)
    }.toDF("x", "y", "z")
    val rc = Audits.partialCorrFrom(conf).head()
    assert(rc.getDouble(1) > 0.9, s"pooled r_xy ${rc.getDouble(1)} should look strong")
    assert(!rc.isNullAt(4) && math.abs(rc.getDouble(4)) < 0.2,
      s"partial must collapse once z is controlled")
  }

  // ---------------------------------------------------------------- t89
  test("t89 Chao1/Good-Turing read planted margins; saturated vocab has zero unseen mass") {
    import spark.implicits._
    val d = Seq(
      ("aa", "x y z z w w w"),   // S=4, N=7, f1=2, f2=1
      ("bb", "p p p q q q")      // f1=f2=0: chao1 collapses to S_obs
    ).toDF("lang", "text")
    val got = TextOps.vocabCoverageFrom(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val aa = got("aa")
    assert((aa.getLong(1), aa.getLong(2), aa.getLong(3), aa.getLong(4))
      == ((7L, 4L, 2L, 1L)))
    assert(aa.getDouble(5) == 4.5, s"chao1 = 4 + 2·1/(2·2) = 4.5, got ${aa.getDouble(5)}")
    assert(math.abs(aa.getDouble(6) - 2.0 / 7) < 1e-6)
    assert(math.abs(aa.getDouble(7) - 5.0 / 7) < 1e-6)
    val bb = got("bb")
    assert(bb.getLong(3) == 0L && bb.getDouble(5) == bb.getLong(2).toDouble)
    assert(bb.getDouble(6) == 0.0 && bb.getDouble(7) == 1.0)
  }

  test("t89 matches a naive tokenize-and-count recompute on sf0.001") {
    val raw = Tables.documents(spark, dir).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = raw.groupBy(_._1).map { case (lang, ds) =>
      // split(-1) keeps trailing empties — the engine's split() semantics
      val f = ds.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map(_._2.length.toLong)
      val sObs = f.size.toLong; val n = f.sum
      val f1 = f.count(_ == 1L).toLong; val f2 = f.count(_ == 2L).toLong
      lang -> ((n, sObs, f1, f2,
        r6(sObs.toDouble + f1.toDouble * (f1 - 1).toDouble
          / (2.0 * (f2 + 1).toDouble)),
        r6(f1.toDouble / n.toDouble), r6(1.0 - f1.toDouble / n.toDouble)))
    }
    val got = TextOps.t89VocabCoverage(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    }.toMap
    assert(got == want, s"got $got\nwant $want")
  }

  // ---------------------------------------------------------------- t90
  test("t90 HL: zero on exact calibration, 12 on a planted miss, degenerate bins drop") {
    import spark.implicits._
    val rows =
      // bucket 2: 4 docs at p=0.25, exactly 1 passes → O = E → term 0
      Seq.tabulate(4)(i => (250000000L, if (i == 0) 1L else 0L)) ++
      // bucket 7: 4 docs at p=0.75, none pass → term = 4·(3e9)²/(3e9·1e9) = 12
      Seq.fill(4)((750000000L, 0L)) ++
      // bucket 0: score 0 → zero binomial variance → excluded from H and df
      Seq.fill(2)((0L, 0L))
    val got = TextOps.hosmerLemeshowFrom(rows.toDF("score_n9", "pass"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(0L, 2L, 7L))
    assert(got(2L).getDouble(4) == 0.0, s"calibrated bin term ${got(2L).getDouble(4)}")
    assert(got(7L).getDouble(4) == 12.0, s"missed bin term ${got(7L).getDouble(4)}")
    assert(got(0L).isNullAt(4), "zero-variance bin must be excluded")
    // H sums only the two live bins; df = live bins − 2 = 0
    assert(got(2L).getDouble(5) == 12.0 && got(2L).getLong(6) == 0L)
  }

  test("t90 matches a naive bucket recompute on sf0.001") {
    val base = TextOps.t90HosmerLemeshow(spark, dir)
    val raw = TextOps.hlJoinedForSpec(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val want = raw.groupBy { case (s, _) => math.min(s * 10 / 1000000000L, 9L) }
      .map { case (b, xs) =>
        val n = xs.length.toLong; val s9 = xs.map(x => BigInt(x._1)).sum
        val obs = xs.map(_._2).sum
        val g = BigInt(obs) * 1000000000L - s9
        val termU6 =
          if (s9 > 0 && s9 < BigInt(n) * 1000000000L)
            Some(math.floor(n.toDouble * g.toDouble * g.toDouble
              / (s9.toDouble * (BigInt(n * 1000000000L).toDouble - s9.toDouble))
              * 1e6 + 0.5).toLong)
          else None
        b -> ((n, obs, termU6))
      }
    val hlU6 = want.values.flatMap(_._3).sum
    val nBins = want.values.count(_._3.isDefined).toLong
    val got = base.collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == want.keySet)
    for ((b, (n, obs, termU6)) <- want) {
      val r = got(b)
      assert(r.getLong(1) == n && r.getLong(2) == obs, s"bucket $b margins")
      termU6 match {
        case Some(t) => assert(math.abs(r.getDouble(4) - t / 1e6) < 1e-9, s"bucket $b term")
        case None => assert(r.isNullAt(4))
      }
      assert(math.abs(r.getDouble(5) - hlU6 / 1e6) < 1e-9, s"hl at bucket $b")
      assert(r.getLong(6) == nBins - 2, s"df at bucket $b")
    }
  }

  // ---------------------------------------------------------------- t91
  test("t91 Friedman: planted block ranks give 7.125; incomplete blocks drop") {
    import spark.implicits._
    val cells =
      // three blocks with the consistent order A < B < C
      (1 to 3).flatMap(s => Seq(
        (s"s$s", "A", 100L, 100L), (s"s$s", "B", 200L, 100L),
        (s"s$s", "C", 300L, 100L))) ++
      // one block with an A=B tie at the bottom (midrank 1.5 → rd 3)
      Seq(("s4", "A", 100L, 100L), ("s4", "B", 100L, 100L),
        ("s4", "C", 200L, 100L)) ++
      // incomplete block: only 2 of 3 langs → must be excluded
      Seq(("s5", "A", 999L, 1L), ("s5", "C", 1L, 1L))
    val got = TextOps.friedmanFrom(cells.toDF("source", "lang", "s9", "cnt"))
      .collect().map(r => r.getString(0) -> r).toMap
    // R2: A = 2+2+2+3 = 9, B = 4+4+4+3 = 15, C = 24; Σ R2² = 882
    // chi2 = 3·882/(4·3·4) − 3·4·4 = 7.125
    assert(got.keySet == Set("A", "B", "C"))
    for (l <- Seq("A", "B", "C")) {
      assert(got(l).getLong(1) == 4L && got(l).getLong(2) == 3L, s"$l b/k")
      assert(got(l).getDouble(4) == 7.125, s"$l chi2 ${got(l).getDouble(4)}")
      assert(got(l).getLong(5) == 2L)
    }
    assert(got("A").getDouble(3) == 1.125 && got("B").getDouble(3) == 1.875
      && got("C").getDouble(3) == 3.0)
  }

  test("t91 matches a naive within-block midrank recompute on sf0.001") {
    val meta = Tables.documents(spark, dir).select("doc_id", "lang", "source")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val sc = TextOps.t75QualityClassifier(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_n9"))
    val cells = sc.groupBy { case (id, _) => meta(id) }
      .map { case ((lang, source), xs) =>
        ((source, lang), (xs.map(_._2).sum, xs.length.toLong))
      }
    val k = cells.keys.map(_._2).toSet.size.toLong
    val bySource = cells.groupBy(_._1._1).filter(_._2.size.toLong == k)
    val rds = bySource.toSeq.flatMap { case (_, cs) =>
      val means = cs.toSeq.map { case ((_, lang), (s9, cnt)) =>
        lang -> (s9.toDouble / cnt.toDouble)
      }
      means.map { case (lang, m) =>
        val less = means.count(_._2 < m).toLong
        val eq = means.count(_._2 == m).toLong
        lang -> (2L * less + eq + 1L)
      }
    }
    val rj = rds.groupBy(_._1).map { case (l, xs) =>
      l -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val b = bySource.size.toLong
    val ssq = rj.values.map { case (_, r2) => r2 * r2 }.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val chi2 = r6(3.0 * ssq.toDouble
      / (b.toDouble * k.toDouble * (k + 1).toDouble)
      - 3.0 * b.toDouble * (k + 1).toDouble)
    val got = TextOps.t91Friedman(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))).toMap
    assert(got.keySet == rj.keySet)
    for ((l, (bl, r2)) <- rj) {
      assert(got(l)._1 == b && got(l)._1 == bl && got(l)._2 == k, s"$l b/k")
      assert(got(l)._3 == r6(r2.toDouble / (2.0 * b.toDouble)), s"$l mean_rank")
      assert(got(l)._4 == chi2, s"$l chi2 ${got(l)._4} want $chi2")
      assert(got(l)._5 == k - 1)
    }
  }

  // ---------------------------------------------------------------- t92
  test("t92 fertility reads planted tokenizer margins exactly; OOV words drop") {
    import spark.implicits._
    val trained = Seq(("ab", 2L), ("c", 1L)).toDF("w", "n_toks")
    val d = Seq(("aa", "ab c ab zz")).toDF("lang", "text")
    val r = TextOps.fertilityFrom(d, trained).collect()
    assert(r.length == 1)
    val row = r.head
    // zz is OOV → dropped; words = [ab, c, ab], tokens = 2+1+2
    assert(row.getLong(1) == 3L && row.getLong(2) == 5L)
    assert(math.abs(row.getDouble(3) - 5.0 / 3) < 1e-6, "fertility 5/3")
    assert(row.getDouble(4) == 1.0, "5 chars over 5 tokens")
    assert(math.abs(row.getDouble(5) - 1.0 / 3) < 1e-6, "only c is whole")
  }

  test("t92 per-lang rollup conserves t81's per-doc word and token totals on sf0.001") {
    val perLang = TextOps.t92Fertility(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val perDoc = TextOps.t81BpeEncode(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // same trained vocab, same OOV drop → the two rollups partition the
    // same joined corpus
    assert(perLang.map(_._1).sum == perDoc.map(_._1).sum, "word totals")
    assert(perLang.map(_._2).sum == perDoc.map(_._2).sum, "token totals")
    val ferts = TextOps.t92Fertility(spark, dir).collect().map(_.getDouble(3))
    assert(ferts.forall(f => f >= 1.0), "every word is at least one token")
  }

  // ---------------------------------------------------------------- c88
  test("c88 funnel columns reconcile with the gates they attribute (sf0.001)") {
    val rows = TextOps.c88GateFunnel(spark, dir).collect()
    assert(rows.length == 20, "one row per source")
    // per-source invariants: the composed gate can never beat any
    // single gate, and token retention is a true fraction
    for (r <- rows) {
      val surv = r.getLong(5)
      assert(surv <= r.getLong(2) && surv <= r.getLong(3) && surv <= r.getLong(4),
        s"${r.getString(0)} surviving exceeds a single gate")
      assert(r.getLong(7) <= r.getLong(6), s"${r.getString(0)} tokens_out > tokens_in")
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
    // corpus totals reconcile against the source gates
    val docsN = Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == docsN)
    val rulePass = TextOps.t82GopherRules(spark, dir).collect()
      .map(_.getAs[Int]("pass").toLong).sum
    assert(rows.map(_.getLong(2)).sum == rulePass, "rule gate total")
    val learnedKeep = TextOps.t75QualityClassifier(spark, dir).collect()
      .map(_.getAs[Long]("keep")).sum
    assert(rows.map(_.getLong(3)).sum == learnedKeep, "learned gate total")
    val uniqueN = Tables.documents(spark, dir)
      .select(md5(col("text"))).distinct().count()
    assert(rows.map(_.getLong(4)).sum == uniqueN, "keeper election total")
  }

  // ---------------------------------------------------------------- t93
  test("t93 novelty: shared 8-gram marks both docs, unique doc reads 1, short doc drops") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, shared),                        // exactly one window, shared with 2
      (2L, s"pre $shared post"),           // 3 windows, the middle one shared
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")), // 5 windows, all unique
      (4L, "too short")                    // < 8 tokens → no row
    ).toDF("doc_id", "text")
    val got = Dedup.ngramNoveltyFrom(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, 1L, 0.0)), s"doc1 ${got(1L)}")
    assert(got(2L)._1 == 3L && got(2L)._2 == 1L, s"doc2 ${got(2L)}")
    assert(math.abs(got(2L)._3 - (1.0 - 1.0 / 3)) < 1e-6)
    assert(got(3L) == ((5L, 0L, 1.0)), s"doc3 ${got(3L)}")
  }

  test("t93 matches a naive cross-doc 8-gram census on sf0.001") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val grams = docs.flatMap { case (id, t) =>
      if (t.length < 8) Nil
      else (0 to t.length - 8).map(i => (id, t.slice(i, i + 8).mkString(" ")))
    }
    val census = grams.groupBy(_._2).map { case (g, xs) =>
      g -> xs.map(_._1).distinct.length
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = grams.groupBy(_._1).map { case (id, xs) =>
      val nw = xs.length.toLong
      val ns = xs.count(x => census(x._2) >= 2).toLong
      id -> ((nw, ns, r6(1.0 - ns.toDouble / nw.toDouble)))
    }
    val got = Dedup.t93NgramNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    for ((id, w) <- want)
      assert(got(id) == w, s"doc $id got ${got(id)} want $w")
    // the synthetic corpus plants exact duplicates: some doc must be non-novel
    assert(want.values.exists(_._3 < 1.0), "expected at least one shared window")
  }

}
