package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audits, Curation, Sampling}

/** Round-11 selection/audit additions:
  *   - d59 DSIR importance selection (Xie et al. 2023): naive in-memory
  *     recompute of the hashed-n-gram log-ratio weights, a planted
  *     vocabulary-separation test (an UNLABELED doc written in the
  *     target vocabulary must outrank one written off-target — the
  *     point of importance weighting), and exact partitioning
  *     invariance of the integer weights;
  *   - c81 source overlap matrix: planted shingle sets with a
  *     hand-computed Jaccard, plus a full naive recompute on testdata;
  *   - q95 k-anonymity audit: planted group sizes (including a
  *     negative-balance band pinning floor semantics) and a naive
  *     recompute on testdata.
  */
class SelectionAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
  }

  private def grams(text: String): Seq[String] = {
    val ts = text.split(" ").toSeq
    ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  /** Naive DSIR weights: bucket counts → snapped per-bucket log ratio →
    * exact integer dot product per doc. Mirrors the operator's contract.
    */
  private def naiveDsir(docs: Seq[(Long, String, String)]): Seq[(Long, String, Long)] = {
    val B = 256
    val occ = docs.flatMap { case (id, lang, text) =>
      grams(text).map(g => (id, lang, h60(g) % B))
    }
    val cr = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = occ.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tr = cr.values.sum.toDouble
    val tt = ct.values.sum.toDouble
    val lr9 = cr.keys.map { b =>
      val pt = (ct.getOrElse(b, 0L) + 0.5) / (tt + 128.0)
      val pr = (cr(b) + 0.5) / (tr + 128.0)
      b -> math.floor((math.log(pt) - math.log(pr)) * 1e9 + 0.5).toLong
    }.toMap
    occ.groupBy(o => (o._1, o._2)).map { case ((id, lang), os) =>
      (id, lang, os.groupBy(_._3).map { case (b, bs) => bs.size * lr9(b) }.sum)
    }.toSeq.sortBy(r => (-r._3, r._1))
  }

  test("d59 matches a naive in-memory recompute on testdata") {
    val got = Sampling.d59DsirSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = naiveDsir(docs).take(100)
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("d59 ranks an unlabeled target-vocabulary doc above an off-target one") {
    val s = spark; import s.implicits._
    val vocabA = (1 to 12).map(i => s"alpha$i")
    val vocabB = (1 to 12).map(i => s"beta$i")
    def mk(v: Seq[String], shift: Int): String =
      (v.drop(shift) ++ v.take(shift)).mkString(" ")
    val d = Seq(
      (1L, "en", mk(vocabA, 0)), (2L, "en", mk(vocabA, 3)),
      (3L, "de", mk(vocabB, 0)), (4L, "de", mk(vocabB, 5)),
      (5L, "xx", mk(vocabA, 7)), // unlabeled, target-like
      (6L, "xx", mk(vocabB, 7))  // unlabeled, off-target
    ).toDF("doc_id", "lang", "text")
    val w = Sampling.dsirSelectFrom(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(5L) > w(6L), s"target-vocab xx doc must outrank off-target: $w")
    assert(Seq(1L, 2L, 5L).map(w).min > Seq(3L, 4L, 6L).map(w).max,
      s"every target-vocab doc above every off-target doc: $w")
  }

  test("d59 weights are partitioning-invariant (exact integers)") {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    val a = Sampling.dsirSelectFrom(d.repartition(7)).collect().toSeq
    val b = Sampling.dsirSelectFrom(d.coalesce(1)).collect().toSeq
    assert(a == b)
  }

  test("c81 planted shingle sets give the hand-computed matrix") {
    val s = spark; import s.implicits._
    // A: {a b c, b c d, c d e}; B: {b c d, c d e, d e f} → inter 2 of 4
    // C: sub-3-token doc only → drops out entirely
    val d = Seq(
      ("srcA", "a b c d e"), ("srcB", "b c d e f"), ("srcC", "x y")
    ).toDF("source", "text")
    val got = Curation.sourceOverlapFrom(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(("srcA", "srcB", 3L, 3L, 2L, 0.5)), s"got $got")
  }

  test("c81 matches a naive per-source shingle-set recompute on testdata") {
    val got = Curation.c81SourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    val bySource = Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues { ds =>
        ds.flatMap { case (_, text) =>
          val ts = text.split(" ").toSeq
          if (ts.size < 3) Nil
          else ts.sliding(3).map(w => h60(w.mkString(" "))).toSeq
        }.toSet
      }.toMap
    val srcs = bySource.keys.toSeq.sorted
    val want = for {
      a <- srcs
      b <- srcs if a < b
      inter = (bySource(a) & bySource(b)).size.toLong
      if inter > 0
    } yield {
      val (na, nb) = (bySource(a).size.toLong, bySource(b).size.toLong)
      (a, b, na, nb, inter,
        BigDecimal(inter.toDouble / (na + nb - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == want, s"sizes ${got.size} vs ${want.size}")
  }

  test("q95 planted groups give the exact risk profile, with a negative band") {
    val s = spark; import s.implicits._
    val rows =
      Seq.fill(1)((0, "A", 100.0)) ++   // band 0, size 1
        Seq.fill(4)((0, "B", 1500.0)) ++ // band 1, size 4
        Seq.fill(12)((1, "A", -50.0))    // band -1 (floor!), size 12
    val d = rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Audits.kAnonymityFrom(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val want = Seq(
      (2L, 3L, 17L, 1L, 1L, 1L, 0.058824),
      (5L, 3L, 17L, 1L, 2L, 5L, 0.294118),
      (10L, 3L, 17L, 1L, 2L, 5L, 0.294118))
    assert(got == want, s"got $got")
  }

  test("d60 Gumbel resample matches a naive recompute and differs from plain top-K") {
    val got = Sampling.d60DsirResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val weights = naiveDsir(docs) // EVERY doc is perturbed, not just the top-K
    val want = weights.map { case (id, lang, w9) =>
      val u = (h60(s"$id:7").toDouble + 0.5) / 1152921504606846976.0
      val g9 = math.floor(-math.log(-math.log(u)) * 1e9 + 0.5).toLong
      (id, lang, w9, g9, w9 + g9)
    }.sortBy(r => (-r._5, r._1)).take(100)
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // the perturbation must actually reorder something vs the pure
    // weight order, or the query degenerates to d59
    assert(got.map(_._1) != weights.map(_._1).take(got.size),
      "Gumbel noise must permute the ranking")
  }

  test("d59 frozen-model scorer reproduces the batch weights") {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    val model = Sampling.dsirModelFrom(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val occ = Sampling.dsirGramsFrom(d)
    val tr = occ.count()
    val tt = occ.filter(col("lang") === "en").count()
    val lr9 = (0 until 256).map(b => model.getOrElse(b.toLong, Sampling.dsirOovLr9(tt, tr)))
    val scored = Sampling.dsirScoresFrom(d, lr9).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batch = Sampling.dsirSelectFrom(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(batch.nonEmpty && batch.forall { case (id, w) => scored(id) == w },
      "per-row frozen-model scores must equal the batch dot products")
  }

  test("q96 planted groups give the exact diversity profile") {
    val s = spark; import s.implicits._
    val rows =
      Seq((0, "A", 100.0), (0, "A", 150.0)) ++             // l=1, g=2
        Seq((1, "A", 100.0), (1, "B", 150.0)) ++           // l=2, g=2
        Seq((2, "A", 100.0), (2, "A", 150.0), (2, "B", 100.0), (2, "C", 150.0)) // l=3, g=4
    val d = rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Audits.lDiversityFrom(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val want = Seq(
      (2L, 3L, 8L, 1L, 1L, 2L, 0.25),
      (3L, 3L, 8L, 1L, 2L, 4L, 0.5))
    assert(got == want, s"got $got")
  }

  test("q96 matches a naive recompute on testdata") {
    val got = Audits.q96LDiversity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getInt(0), r.getString(1), math.floor(r.getDouble(2) / 1000.0).toLong))
    val groups = cust.groupBy(c => (c._1, c._3)).values
      .map(rs => (rs.length.toLong, rs.map(_._2).distinct.size.toLong)).toSeq
    val (nG, nR, minL) = (groups.size.toLong, groups.map(_._1).sum, groups.map(_._2).min)
    val want = Seq(2L, 3L).map { k =>
      val below = groups.filter(_._2 < k)
      (k, nG, nR, minL, below.size.toLong, below.map(_._1).sum,
        BigDecimal(below.map(_._1).sum.toDouble / nR)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == want, s"got $got want $want")
  }

  test("c82 matches a naive bigram-LM + exponentiated-gradient recompute on testdata") {
    val got = Curation.c82DoremiReweight(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val pairs = docs.flatMap { case (src, text) =>
      text.split(" ").toSeq.sliding(2).filter(_.size == 2).map(p => (src, p(0), p(1)))
    }
    val vocab = docs.flatMap(_._2.split(" ")).distinct.length.toLong
    val c2 = pairs.groupBy(p => (p._2, p._3)).view.mapValues(_.length).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val lp = c2.map { case ((w1, w2), c) =>
      (w1, w2) -> math.floor(math.log((c + 1).toDouble / (c1(w1) + vocab).toDouble)
        * 1e9 + 0.5).toLong
    }
    val perSrc = pairs.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.map(p => lp((p._2, p._3))).sum)
    }.toMap
    val tb = perSrc.values.map(_._1).sum
    val tl = perSrc.values.map(_._2).sum
    val ns = perSrc.size
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val en9s = perSrc.toSeq.sortBy(_._1).map { case (src, (nb, sl)) =>
      val excess = math.max(0.0, (tl.toDouble / tb.toDouble - sl.toDouble / nb.toDouble) / 1e9)
      (src, nb, sl, excess, math.floor(math.exp(1.0 * excess) * 1e9 + 0.5).toLong)
    }
    val esum = en9s.map(_._5).sum
    val want = en9s.map { case (src, nb, sl, excess, en9) =>
      (src, nb, r6((0.0 - sl.toDouble / nb.toDouble) / 1e9), r6(excess), en9,
        r6(1.0 / ns), r6(en9.toDouble / esum.toDouble))
    }
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // the step must actually move mass: at least one source upweighted
    // above uniform and every at-or-below-reference source pinned at
    // exp(0) = 1e9 exactly
    assert(got.exists(_._5 > 1000000000L), "some source must carry positive excess")
    assert(got.filter(_._4 == 0.0).forall(_._5 == 1000000000L))
  }

  test("c83 matches a naive weights → apportionment → hash-rank selection recompute") {
    val got = Curation.c83WeightedMixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    // per-source en9 exactly as in the c82 naive
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val pairs = docs.flatMap { case (src, _, text) =>
      text.split(" ").toSeq.sliding(2).filter(_.size == 2).map(p => (src, p(0), p(1)))
    }
    val vocab = docs.flatMap(_._3.split(" ")).distinct.length.toLong
    val c2 = pairs.groupBy(p => (p._2, p._3)).view.mapValues(_.length).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val lp = c2.map { case ((w1, w2), c) =>
      (w1, w2) -> math.floor(math.log((c + 1).toDouble / (c1(w1) + vocab).toDouble)
        * 1e9 + 0.5).toLong
    }
    val perSrc = pairs.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.map(p => lp((p._2, p._3))).sum)
    }.toMap
    val tb = perSrc.values.map(_._1).sum
    val tl = perSrc.values.map(_._2).sum
    val en9 = perSrc.map { case (src, (nb, sl)) =>
      val excess = math.max(0.0, (tl.toDouble / tb.toDouble - sl.toDouble / nb.toDouble) / 1e9)
      src -> math.floor(math.exp(1.0 * excess) * 1e9 + 0.5).toLong
    }
    // largest-remainder apportionment over the en9 weights (budget 211)
    val budget = 211L
    val esum = en9.values.sum
    val nPer = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val base = en9.view.mapValues(w => budget * w / esum).toMap
    val rem = en9.map { case (s, w) => s -> budget * w % esum }
    val leftover = (budget - base.values.sum).toInt
    val seats = rem.toSeq.sortBy { case (s, r) => (-r, s) }.take(leftover).map(_._1).toSet
    val quota = en9.keys.map(s =>
      s -> math.min(base(s) + (if (seats(s)) 1L else 0L), nPer(s))).toMap
    // two-phase selection: cross-multiplied threshold, then hash rank
    val space = BigInt(1) << 60
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      val q = quota(src)
      ds.map { case (_, id, _) => (id, h60(id.toString)) }
        .filter { case (_, h) => BigInt(h) * nPer(src) < space * 4 * q }
        .sortBy { case (id, h) => (h, id) }
        .take(q.toInt).zipWithIndex
        .map { case ((id, _), i) => (src, q, i + 1, id) }
    }
    assert(got == want, s"sizes ${got.size} vs ${want.size}; " +
      s"first diff ${got.zip(want).find(p => p._1 != p._2)}")
    // the budget must actually bind somewhere for the test to mean
    // anything: at least one source's quota below its doc count OR the
    // full budget spent
    assert(quota.values.sum == math.min(budget, nPer.values.sum))
  }

  test("q97 planted distributions give the hand-computed TVD profile (incl. absent segment)") {
    val s = spark; import s.implicits._
    // global: A=6, B=2 (n=8). G1=(0,band0): A=4 (B ABSENT) → TVD=0.25.
    // G2=(1,band0): A=2,B=2 → TVD=0.25. t=0.2 flags both; t=0.3 neither.
    val rows = Seq.fill(4)((0, "A", 100.0)) ++
      (Seq.fill(2)((1, "A", 100.0)) ++ Seq.fill(2)((1, "B", 100.0)))
    val got = Audits.tClosenessFrom(rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val want = Seq(
      (2L, 2L, 8L, 0.25, 2L, 8L, 1.0),
      (3L, 2L, 8L, 0.25, 0L, 0L, 0.0))
    assert(got == want, s"got $got")
  }

  test("q97 matches a naive exact-rational recompute on testdata") {
    val got = Audits.q97TCloseness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getInt(0), r.getString(1), math.floor(r.getDouble(2) / 1000.0).toLong))
    val n = cust.length.toLong
    val glob = cust.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val groups = cust.groupBy(c => (c._1, c._3)).values.map { rs =>
      val g = rs.length.toLong
      val cgs = rs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val num = glob.map { case (seg, cs) =>
        math.abs(cgs.getOrElse(seg, 0L) * n - cs * g)
      }.sum
      (g, num)
    }.toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (nG, nR) = (groups.size.toLong, groups.map(_._1).sum)
    val maxTvd = groups.map { case (g, num) => r6(num.toDouble / (2L * g * n).toDouble) }.max
    val want = Seq(2L, 3L).map { t =>
      val above = groups.filter { case (g, num) => 10L * num > 2L * t * g * n }
      (t, nG, nR, maxTvd, above.size.toLong, above.map(_._1).sum,
        r6(above.map(_._1).sum.toDouble / nR))
    }
    assert(got == want, s"got $got want $want")
  }

  test("q95 matches a naive recompute on testdata") {
    val got = Audits.q95KAnonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getInt(0), r.getString(1), math.floor(r.getDouble(2) / 1000.0).toLong))
    val sizes = cust.groupBy(identity).values.map(_.length.toLong).toSeq
    val (nG, nR, minG) = (sizes.size.toLong, sizes.sum, sizes.min)
    val want = Seq(2L, 5L, 10L).map { k =>
      val risky = sizes.filter(_ < k)
      (k, nG, nR, minG, risky.size.toLong, risky.sum,
        BigDecimal(risky.sum.toDouble / nR)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == want, s"got $got want $want")
  }
}
