package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, EventWindows, Graph, Multimodal, Relational, Similarity, TextOps}

/** Semantics of the round-7 sixth batch: higher-moment stats (q79),
  * lead-lag cross-correlation (q80), AMOC changepoint (q81) — each
  * checked against an independent naive recomputation, not just the
  * shared oracle SQL.
  */
class Round7fSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  private def dailyCents(): Seq[(String, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"),
        floor(col("value") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toSeq
      .map { case ((et, day), v) => (et, day, v) }

  test("q79 skewness/kurtosis match a naive central-moment recomputation") {
    val got = Relational.q79Moments(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size == 6)
    val raw = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((key, vals) <- raw.groupBy(r => (r._1, r._2))) {
      val xs = vals.map(_._3.toDouble)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      // direct central sums — an INDEPENDENT formulation of the same
      // moments (the query derives them from raw power sums)
      val m2 = xs.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
      val (nGot, meanGot, skewGot, kurtGot) = got(key)
      assert(nGot == xs.length)
      assert(math.abs(meanGot - mean) < 1e-9, s"$key mean")
      assert(math.abs(skewGot - m3 / (math.sqrt(m2) * m2)) < 1e-6, s"$key skew")
      assert(math.abs(kurtGot - (m4 / (m2 * m2) - 3.0)) < 1e-6, s"$key kurt")
      // l_quantity is near-uniform on [1,50]: shape must read flat-topped
      assert(math.abs(skewGot) < 0.3, s"$key skew magnitude")
      assert(kurtGot < 0.0, s"$key platykurtic")
    }
  }

  test("q80 cross-correlation matches a naive lag-aligned Pearson") {
    val got = EventWindows.q80CrossCorr(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    val daily = dailyCents()
    val clicks = daily.filter(_._1 == "click").map(r => r._2 -> r._3).toMap
    val buys = daily.filter(_._1 == "purchase").map(r => r._2 -> r._3).toMap
    for (k <- 0L to 3L) {
      val pairs = clicks.toSeq.flatMap { case (d, x) =>
        buys.get(d + k).map(y => (x.toDouble, y.toDouble))
      }
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (nGot, rGot) = got(k)
      assert(nGot == pairs.length, s"lag $k n")
      assert(math.abs(rGot - r) < 1e-9, s"lag $k xcorr $rGot vs $r")
      assert(rGot >= -1.0 && rGot <= 1.0)
    }
  }

  test("q81 picks the split maximizing the prefix/suffix mean shift") {
    val got = EventWindows.q81Changepoint(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(got.size == 5)
    val daily = dailyCents()
    for ((et, series) <- daily.groupBy(_._1)) {
      val s = series.sortBy(_._2).map(r => (r._2, r._3))
      val tot = s.map(_._2).sum
      val n = s.length
      // naive scan over every candidate split
      val cands = (1 until n).map { i =>
        val cum = s.take(i).map(_._2).sum
        val pre = cum.toDouble / i
        val post = (tot - cum).toDouble / (n - i)
        (s(i - 1)._1, i.toLong, (n - i).toLong, pre, post, math.abs(pre - post))
      }
      val best = cands.sortBy(c => (-c._6, c._1)).head
      val (day, nPre, nPost, pre, post, shift) = got(et)
      assert((day, nPre, nPost) == ((best._1, best._2, best._3)), s"$et split")
      assert(math.abs(pre - best._4) < 1e-9 && math.abs(post - best._5) < 1e-9)
      assert(math.abs(shift - best._6) < 1e-9)
      assert(shift > 0.0, s"$et non-vacuous shift")
      // the reported split really dominates every other candidate
      assert(cands.forall(c => c._6 <= shift), s"$et argmax")
    }
  }

  test("q82 per-node triangles match a naive enumeration; sum ties to q66") {
    val got = Graph.q82ClusteringCoeff(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // naive undirected graph from the same co-purchase projection
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val nbrs = (edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var triTotal = 0L
    for ((node, (deg, tri, lcc)) <- got) {
      val nb = nbrs(node)
      assert(deg == nb.size, s"node $node degree")
      val naive = nb.toSeq.combinations(2)
        .count(p => edges.contains((math.min(p(0), p(1)), math.max(p(0), p(1)))))
      assert(tri == naive, s"node $node triangles")
      val want = 2.0 * naive / (nb.size.toDouble * (nb.size.toDouble - 1.0))
      assert(math.abs(lcc - want) < 1e-12 && lcc >= 0.0 && lcc <= 1.0)
      triTotal += tri
    }
    // only degree-1 nodes are excluded, and they carry no triangles
    assert(got.keySet == nbrs.filter(_._2.size >= 2).keySet)
    // each triangle contributes one count at each of its three corners
    val global = Graph.q66Triangles(spark, dir).collect()(0).getLong(2)
    assert(triTotal == 3 * global, s"corner sum $triTotal vs 3x$global")
    assert(global > 0, "non-vacuous")
  }

  test("t66 Zipf slope matches a naive OLS over snapped ln points") {
    val got = TextOps.t66ZipfSlope(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("de", "en", "es", "fr", "zh"))
    val terms = Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))
    for ((lang, all) <- terms.groupBy(_._1)) {
      val ranked = all.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(100)
      val pts = ranked.zipWithIndex.map { case ((_, c), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5),
          math.floor(math.log(c.toDouble) * 1e6 + 0.5))
      }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (nGot, slopeGot, interceptGot) = got(lang)
      assert(nGot == pts.length, s"$lang n_terms")
      assert(math.abs(slopeGot - slope) < 1e-9, s"$lang slope $slopeGot vs $slope")
      assert(math.abs(interceptGot - (sy - slope * sx) / n / 1e6) < 1e-9)
      // a token corpus must slope DOWN rank-frequency-wise
      assert(slopeGot < 0.0, s"$lang Zipf direction")
    }
  }

  test("m67 scenes tile each video; cuts align with m65; keyframe is brightest") {
    val scenes = Multimodal.m67Keyframes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(scenes.nonEmpty)
    val cuts = Multimodal.m65SceneChanges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((media, ss) <- scenes.groupBy(_._1)) {
      val ordered = ss.sortBy(_._2)
      // scene ids are 1..k and consecutive scenes tile the frame range
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq, s"media $media ids")
      assert(ordered.head._3 == 0L, s"media $media starts at frame 0")
      for (Array(a, b) <- ordered.sliding(2).map(_.toArray)) {
        assert(b._3 == a._4 + 1, s"media $media gapless at scene ${b._2}")
      }
      for (s <- ordered) {
        assert(s._5 == s._4 - s._3 + 1, s"media $media scene ${s._2} n_frames")
        assert(s._6 >= s._3 && s._6 <= s._4, s"keyframe inside scene")
        // every scene after the first opens exactly at an m65 cut frame
        if (s._2 > 1) assert(cuts.contains((media, s._3)), s"media $media cut ${s._3}")
      }
      // total scene count = 1 + number of detected cuts for this media
      assert(ordered.length == 1 + cuts.count(_._1 == media), s"media $media k")
    }
  }

  test("c77 datasheet matches a naive per-source recomputation") {
    val got = Curation.c77SourceDatasheet(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val dupTexts = docs.groupBy(_._4).filter(_._2.length > 1).keySet
    // chunk-dup docs: non-first instances of any 8-token chunk hash in
    // the (doc_id, chunk_idx) total order — d47 semantics, independently
    val chunks = docs.flatMap { case (id, _, _, text) =>
      text.split(" ").grouped(8).zipWithIndex
        .map { case (c, i) => (c.mkString(" "), id, i) }
    }
    val chunkDupIds = chunks.groupBy(_._1).values
      .flatMap(_.sortBy(c => (c._2, c._3)).drop(1).map(_._2)).toSet
    val gate = graft.operators.TextOps.t55Repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(got.keySet == docs.map(_._2).toSet)
    for ((src, (nDocs, nLangs, topLang, totTok, dupDocs, cdupDocs, passDocs)) <- got) {
      val mine = docs.filter(_._2 == src)
      assert(nDocs == mine.length, s"$src n_docs")
      val langCounts = mine.groupBy(_._3).view.mapValues(_.length).toMap
      assert(nLangs == langCounts.size, s"$src n_langs")
      assert(topLang == langCounts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1)
      assert(totTok == mine.map(_._4.split(" ").length.toLong).sum, s"$src tokens")
      assert(dupDocs == mine.count(d => dupTexts.contains(d._4)), s"$src dups")
      assert(cdupDocs == mine.count(d => chunkDupIds.contains(d._1)), s"$src cdups")
      assert(passDocs == mine.map(d => gate(d._1).toLong).sum, s"$src gate")
    }
    // global accounting ties to the corpus-level recomputation (whole-doc
    // dups are honestly zero on this corpus; the chunk granularity fires
    // at the gated SFs — 47 docs at sf0.01)
    assert(got.values.map(_._5).sum == docs.count(d => dupTexts.contains(d._4)))
    assert(got.values.map(_._6).sum == docs.count(d => chunkDupIds.contains(d._1)))
  }

  test("q85 RANGE frame matches a naive value-offset recomputation incl. day ties") {
    val got = Relational.q85RangeFrame(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.size == orders.length)
    var tieSeen = false
    for ((cust, grp) <- orders.groupBy(_._1); o <- grp) {
      // RANGE frame = ALL orders of the customer with day in [d-89, d] —
      // including same-day peers that sort after this row
      val frame = grp.filter(g => g._3 >= o._3 - 89 && g._3 <= o._3)
      val (day, n, spend) = got((cust, o._2))
      assert(day == o._3)
      assert(n == frame.length, s"cust $cust order ${o._2} count")
      assert(spend == frame.map(_._4).sum, s"cust $cust order ${o._2} spend")
      tieSeen ||= grp.count(_._3 == o._3) > 1
    }
    // the tie-insensitivity claim must actually be exercised
    assert(tieSeen, "corpus must contain same-day orders per customer")
  }

  test("m68 loudness audit matches a naive per-sample recomputation") {
    val got = Multimodal.m68LoudnessAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val wavs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).where(col("doc_id") % 4 === 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == wavs.map(_._1).toSet && got.nonEmpty)
    for ((id, text) <- wavs) {
      val s = text.map(c => (c.toInt - 109).toLong)
      val (n, dur, peak, clipped, rms) = got(id)
      assert(n == s.length)
      assert(math.abs(dur - s.length / 16000.0) < 1e-12)
      assert(peak == s.map(math.abs).max)
      assert(clipped == s.count(x => math.abs(x) >= 70))
      assert(math.abs(rms - math.sqrt(s.map(x => x * x).sum.toDouble / s.length)) < 1e-12)
    }
    // the clip bar discriminates: some samples clip, most don't
    assert(got.values.exists(_._4 > 0) && got.values.forall(v => v._4 < v._1))
  }

  test("q84 windowed KMV: exact below k, inside error bounds when saturated") {
    val got = EventWindows.q84WindowedKmv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 3600000000"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = ev.flatMap { case (h, u) => (h to h + 5L).map(w => (w, u)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    assert(got.map(_._1).toSet == exact.keySet, "every trailing window reported")
    for ((w, nMins, est) <- got) {
      val ex = exact(w)
      if (nMins < 64) assert(est == ex.toDouble, s"window $w must be exact below k")
      else assert(math.abs(est - ex) <= 0.4 * ex, s"window $w est $est vs $ex")
    }
    // windows are consecutive hours (the fan-out leaves no holes inside
    // the observed range)
    val ws = got.map(_._1).sorted
    assert(ws.zip(ws.drop(1)).forall { case (a, b) => b == a + 1 })
  }

  test("q86 skyline equals naive dominance; every drop is dominated by a keeper") {
    val got = Relational.q86Skyline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val parts = Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"),
        floor(col("p_retailprice") * 100.0 + 0.5).cast("long"), col("p_size").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def dominates(b: (String, Long, Long, Long), a: (String, Long, Long, Long)) =
      b._3 <= a._3 && b._4 >= a._4 && (b._3 < a._3 || b._4 > a._4)
    val want = parts.filter { a =>
      !parts.exists(b => b._1 == a._1 && b._2 != a._2 && dominates(b, a))
    }.map(p => (p._1, p._2)).toSet
    assert(got.map(p => (p._1, p._2)).toSet == want)
    assert(got.length < parts.length, "some parts must be dominated")
    // completeness the other way: every dropped part has a skyline dominator
    val sky = got.groupBy(_._1)
    for (a <- parts if !want.contains((a._1, a._2))) {
      assert(sky(a._1).exists(b => dominates((b._1, b._2, b._3, b._4), a)),
        s"dropped part ${a._2} lacks a skyline dominator")
    }
  }

  test("t67 OOV rates match a naive vocabulary recomputation") {
    val got = TextOps.t67OovRate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val space = BigInt(1) << 60
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = BigInt(md.map("%02x".format(_)).mkString.take(15), 16)
      if (h < space * 8 / 10) "train" else if (h < space * 9 / 10) "val" else "test"
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), splitOf(r.getLong(0)), r.getString(1).split(" ").toSeq))
    // budgeted vocab: top-16 train tokens by (count desc, term asc)
    val vocab = docs.filter(_._2 == "train").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(16).map(_._1).toSet
    val evalDocs = docs.filter(_._2 != "train")
    assert(got.keySet == evalDocs.map(_._1).toSet)
    for ((id, sp, t) <- evalDocs) {
      val oov = t.count(!vocab.contains(_))
      val (gSp, gTok, gOov, gRate) = got(id)
      assert(gSp == sp && gTok == t.length && gOov == oov, s"doc $id")
      assert(math.abs(gRate - math.round(oov.toDouble / t.length * 1e6) / 1e6) < 1e-9)
    }
    // the audit discriminates on this corpus: OOV exists but is not total
    assert(got.values.exists(_._3 > 0) && got.values.forall(v => v._3 < v._2))
  }

  test("t68 BPE round elects the max pair and applies a greedy left merge") {
    val got = TextOps.t68BpeMergeRound(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(got.nonEmpty)
    val words = Tables.documents(spark, dir)
      .select(col("text")).collect().flatMap(_.getString(0).split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // naive weighted pair counts
    val pairCounts = words.toSeq.flatMap { case (w, c) =>
      w.toSeq.zip(w.toSeq.drop(1)).map(p => (s"${p._1} ${p._2}", c))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val bestPair = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }.head
    assert(got.forall(_._3 == bestPair._1), "elected pair")
    assert(got.forall(_._4 == bestPair._2), "elected pair count")
    // greedy left-to-right non-overlapping merge per word
    val Array(pa, pb) = bestPair._1.split(" ")
    for ((word, cnt, _, _, nBefore, nAfter, spelling) <- got) {
      assert(cnt == words(word))
      assert(nBefore == word.length)
      val merged = scala.collection.mutable.ArrayBuffer[String]()
      for (ch <- word.map(_.toString)) {
        if (merged.nonEmpty && merged.last == pa && ch == pb)
          merged(merged.length - 1) = pa + pb
        else merged += ch
      }
      assert(spelling == merged.mkString(" "), s"word $word")
      assert(nAfter == merged.length, s"word $word symbol count")
    }
    // the round actually compresses something
    assert(got.exists(r => r._6 < r._5), "some word must merge")
  }

  test("t69 confusion matrix recomputes from t50's per-doc predictions") {
    val got = TextOps.t69LangConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val preds = TextOps.t50LangId(spark, dir)
      .select(col("labeled_lang"), col("pred_lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want)
    for ((label, rows) <- got.groupBy(_._1)) {
      val trueTotal = preds.count(_._1 == label).toLong
      assert(rows.forall(_._4 == trueTotal), s"$label n_true")
      assert(rows.map(_._3).sum == trueTotal, s"$label row sum")
      rows.foreach(r => assert(math.abs(r._5 - math.round(
        r._3.toDouble / trueTotal * 1e6) / 1e6) < 1e-9))
    }
    // the heuristic classifier is good but not perfect on this corpus —
    // both the diagonal and at least one off-diagonal cell must exist
    assert(got.exists(r => r._1 == r._2) && got.exists(r => r._1 != r._2))
  }

  test("q87 bounded Bellman-Ford matches a naive weighted relaxation") {
    val got = Graph.q87WeightedPath(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }
    val costs = edges.groupBy(identity).view
      .mapValues(m => 1000000L / m.length).toMap
    val nodes = li.map(_._2).distinct
    var dist = nodes.filter(_ % 500 == 0).map(n => n -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = costs.toSeq.flatMap { case ((s, t), c) =>
        dist.get(s).map(ds => t -> (ds + c))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val want = dist.filter(_._1 % 23 == 0)
    assert(got == want)
    // weights matter: some reached node must cost less than a full-price
    // single hop would suggest via a cheaper multi-edge path existing
    assert(got.values.exists(d => d > 0 && d < 1000000L),
      "some node must be reached through a multiplicity-discounted edge")
  }

  test("q88 kNN vote matches a naive exact-cosine recomputation") {
    val got = Similarity.q88KnnClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val space = BigInt(1) << 60
    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      BigInt(md.map("%02x".format(_)).mkString.take(15), 16) < space * 8 / 10
    }
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label").cast("long")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    val train = vecs.filter(v => isTrain(v._1))
    val ev = vecs.filter(v => !isTrain(v._1))
    assert(train.nonEmpty && ev.nonEmpty)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val preds = ev.map { case (eid, qe, trueLabel) =>
      val top = train.map(t => (t._1, t._3, cos(qe, t._2)))
        .sortBy(t => (-t._3, t._1)).take(5)
      val vote = top.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      (trueLabel, vote)
    }
    val want = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want)
    assert(got.values.sum == ev.length, "every eval vector classified once")
  }

  test("t70 feature hashing matches a naive recomputation and collides") {
    val got = TextOps.t70FeatureHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val want = docs.flatMap { case (id, ts) => ts.map(t => (id, h60(t) % 16)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want)
    // per-doc totals conserve token instances
    for ((id, ts) <- docs)
      assert(got.collect { case ((d, _), c) if d == id => c }.sum == ts.length)
    // the defining trade-off must be exercised: more distinct terms than
    // buckets forces at least one collision
    val termBuckets = docs.flatMap(_._2).distinct.map(t => (h60(t) % 16, t))
    assert(termBuckets.groupBy(_._1).exists(_._2.map(_._2).distinct.length > 1),
      "distinct terms must share a bucket at FeatureDim=16")
  }

  test("q89 time-to-convert quantiles match a naive interval recomputation") {
    val r = EventWindows.q89TimeToConvert(spark, dir).collect()(0)
    val (n, p25, p50, p95) = (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    val byUser = e.groupBy(_._1)
    val deltas = byUser.values.toSeq.flatMap { evs =>
      val cs = evs.filter(_._2 == "click").map(_._3)
      evs.filter(_._2 == "purchase").flatMap { p =>
        val qual = cs.filter(c => c >= p._3 - 86400000000L && c <= p._3)
        if (qual.isEmpty) None else Some((p._3 - qual.max).toDouble / 1000000.0)
      }
    }.sorted
    assert(n == deltas.length && n > 0)
    def quant(q: Double): Double = {
      val pos = q * (deltas.length - 1)
      val lo = deltas(pos.toInt)
      val hi = deltas(math.min(pos.toInt + 1, deltas.length - 1))
      math.round((lo + (pos - math.floor(pos)) * (hi - lo)) * 1e6) / 1e6
    }
    assert(math.abs(p25 - quant(0.25)) < 1e-9, s"p25 $p25 vs ${quant(0.25)}")
    assert(math.abs(p50 - quant(0.5)) < 1e-9)
    assert(math.abs(p95 - quant(0.95)) < 1e-9)
    // monotone and inside the attribution window
    assert(p25 <= p50 && p50 <= p95 && p95 <= 86400.0 && p25 >= 0.0)
    // cross-pin to q78: one delta per ATTRIBUTED purchase, so the
    // conversion count must equal q78's total attributed purchases
    val attributed = EventWindows.q78AttributionJoin(spark, dir).collect()
      .map(_.getLong(2)).sum
    assert(n == attributed, s"q89 n=$n vs q78 attributed=$attributed")
  }

  test("c79 split leakage matches an independent window recomputation") {
    val got = Curation.c79SplitLeakage(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set("test", "val"))
    // independent: split by the h60 threshold, overlapping 8-token
    // windows (concat_ws null-skip ≡ partial tail window on short docs)
    val space = BigInt(1) << 60
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = BigInt(md.map("%02x".format(_)).mkString.take(15), 16)
      if (h < space * 8 / 10) "train" else if (h < space * 9 / 10) "val" else "test"
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), splitOf(r.getLong(0)),
        r.getString(1).split(" ").toSeq))
    def windows(t: Seq[String]): Set[String] =
      (1 to math.max(t.length - 7, 1)).map(i => t.slice(i - 1, i + 7).mkString(" ")).toSet
    val trainW = docs.filter(_._2 == "train").flatMap(d => windows(d._3)).toSet
    for (s <- Seq("test", "val")) {
      val mine = docs.filter(_._2 == s)
      val leaky = mine.count(d => windows(d._3).exists(trainW.contains))
      val shared = mine.map(d => windows(d._3).count(trainW.contains)).sum
      val (nDocs, nLeaky, nShared) = got(s)
      assert(nDocs == mine.length, s"$s docs")
      assert(nLeaky == leaky, s"$s leaky")
      assert(nShared == shared, s"$s shared windows")
    }
  }

  test("kmv sketch merges correctly under incremental streaming updates") {
    // q84's scale story rests on the sketch being MERGEABLE state: the
    // same aggregate fed incrementally (partial buffers merged across
    // micro-batches in Complete mode) must equal the one-shot batch
    // answer on identical data
    val sk = spark
    import sk.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.functions.Vectors.register(spark)
    val events = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 3600000000").as("h"),
        graft.operators.PortableHash.h60(col("user_id")).as("hu"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = events.toSeq.toDF("h", "hu")
      .groupBy(col("h"))
      .agg(call_function("kmv_distinct", col("hu"), lit(64)).as("s"))
      .select(col("h"), col("s.n_mins"), col("s.est")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("h", "hu")
      .groupBy(col("h"))
      .agg(call_function("kmv_distinct", col("hu"), lit(64)).as("s"))
      .select(col("h"), col("s.n_mins"), col("s.est"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch, "incremental merge must equal one-shot batch")
    } finally q.stop()
  }

  test("d57 containment is asymmetric and matches a naive set recomputation") {
    val got = Dedup.d57ContainmentJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Number]("n_src").longValue, r.getLong(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty, "containment pairs exist at sf0.001")
    // naive: distinct 3-gram shingle sets per doc, all ordered pairs
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.length >= 3)
      .map { case (id, t) => id -> t.sliding(3).map(_.mkString(" ")).toSet }
    val want = (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia != ib
      common = (sa intersect sb).size
      if common * 10 >= sa.size * 8
    } yield (ia, ib) -> ((sa.size.toLong, common.toLong))).toMap
    assert(got.keySet == want.keySet)
    for (((a, b), (nSrc, nCommon, c)) <- got) {
      assert((nSrc, nCommon) == want((a, b)), s"($a,$b)")
      assert(c >= 0.8 && c <= 1.0)
    }
    // this corpus's near-dups are same-length edits, so every pair ≥ θ is
    // mutual — asymmetry is pinned on a PLANTED swallow case instead: a
    // short doc fully inside a long one qualifies one way only
    val sk = spark
    import sk.implicits._
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val long = short + " " + (100 to 160).map(i => s"x$i").mkString(" ")
    val other = (200 to 230).map(i => s"y$i").mkString(" ")
    val planted = Seq((1L, short), (2L, long), (3L, other)).toDF("doc_id", "text")
    val p = Dedup.containmentJoinFrom(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)), "short doc must be contained in its superset")
    assert(!p.contains((2L, 1L)), "the superset must NOT be contained back")
  }

  test("q83 deciles tile customers; shares match a naive recomputation") {
    val got = Relational.q83DecileReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 10L).toSeq)
    val spend = Tables.orders(spark, dir)
      .select(col("o_custkey"), floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val ordered = spend.sortBy { case (c, s) => (-s, c) }
    val total = spend.map(_._2).sum
    // equi-depth semantics: rank r lands in bucket (r−1)·10 div n + 1, so
    // size_d = ceil(d·n/10) − ceil((d−1)·n/10) — remainder rows spread
    // across buckets, NOT absorbed by the earliest ones (the old ntile
    // widths only matched because |customers| was a multiple of 10 —
    // ADVICE r10)
    val n = ordered.length
    def cut(d: Long): Int = ((d * n + 9) / 10).toInt
    var idx = 0
    for ((decile, nCust, dSpend, share) <- got) {
      val width = cut(decile) - cut(decile - 1)
      val mine = ordered.slice(idx, idx + width)
      idx += width
      assert(nCust == width, s"decile $decile size")
      assert(dSpend == mine.map(_._2).sum, s"decile $decile spend")
      assert(math.abs(share - dSpend.toDouble / total) < 1e-12)
    }
    assert(idx == ordered.length, "deciles tile all customers")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9, "shares sum to 1")
    // spend concentration: deciles are ordered richest-first
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq)
  }

  test("c78 centroid cosines match a naive float recomputation") {
    val got = Similarity.c78EmbeddingAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val vecs = Tables.embeddings(spark, dir)
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val labels = vecs.map(_._1).distinct.sorted
    assert(got.keySet == (for (a <- labels; b <- labels if a < b) yield (a, b)).toSet)
    // naive: snap to the same integer grid, sum, cosine
    val sums = vecs.groupBy(_._1).view.mapValues { vs =>
      val s = Array.fill(64)(0L)
      for ((_, v) <- vs; i <- v.indices)
        s(i) += math.floor(v(i).toDouble * 200.0 + 0.5).toLong
      (vs.length.toLong, s)
    }.toMap
    for (((a, b), (na, nb, cos)) <- got) {
      val (ca, sa) = sums(a)
      val (cb, sb) = sums(b)
      assert(na == ca && nb == cb, s"($a,$b) counts")
      val dot = sa.zip(sb).map { case (x, y) => x * y }.sum.toDouble
      val want = dot / math.sqrt(
        sa.map(x => x * x).sum.toDouble * sb.map(x => x * x).sum.toDouble)
      assert(math.abs(cos - want) < 1e-12, s"($a,$b) cos $cos vs $want")
      assert(cos >= -1.0 && cos <= 1.0)
    }
  }
}
