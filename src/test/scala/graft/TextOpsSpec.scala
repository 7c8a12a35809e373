package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("t50 langid: argmax is deterministic and scores count stopword hits") {
    import spark.implicits._
    val df = TextOps.t50LangId(spark, dir)
    val cols = df.columns.toSet
    assert(Set("doc_id", "pred_lang", "en_score").subsetOf(cols))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // pred_lang is always one of the profiled languages
    val langs = TextOps.stopwords.keySet
    assert(rows.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
    // argmax consistency: pred score >= every other language score
    val langCols = TextOps.stopwords.keys.toSeq.sorted
    rows.foreach { r =>
      val pred = r.getAs[String]("pred_lang")
      val predScore = r.getAs[Int](s"${pred}_score")
      langCols.foreach(l => assert(predScore >= r.getAs[Int](s"${l}_score")))
    }
    // hand-checked doc: stopword-only text scores exactly its hits
    val hand = Seq(("x1", "en", "the cat of the house and a dog"))
      .toDF("doc_id", "lang", "text")
    hand.createOrReplaceTempView("handdoc")
    val scored = hand.select(
      size(filter(split(col("text"), " "),
        t => t.isin(TextOps.stopwords("en"): _*))).as("s")).collect()
    assert(scored(0).getInt(0) == 5) // the, of, the, and, a
  }

  test("t51 quality: score is in [0,1] and monotone pieces behave") {
    val rows = TextOps.t51Quality(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0, s"quality_score out of range: $q")
      assert(r.getAs[Number]("n_punct").longValue <= r.getAs[Int]("n_chars_calc"))
    }
  }

  test("t52 token counts: regex tokens >= whitespace tokens on punctuated text") {
    import spark.implicits._
    val df = Seq(("d1", "en", "hello, world! it's 2026."))
      .toDF("doc_id", "lang", "text")
    val out = df.select(
      size(split(col("text"), " ")).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z0-9_]+|[^a-zA-Z0-9_ ]")).as("re_tokens"))
      .collect()(0)
    assert(out.getInt(0) == 4)
    // hello , world ! it ' s 2026 .  => 9
    assert(out.getAs[Number](1).longValue == 9L)
  }

  test("t55 repetition: fractions bounded, a degenerate doc fails the gate, a diverse one passes") {
    import spark.implicits._
    val rows = TextOps.t55Repetition(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tu = r.getAs[Double]("top_unigram_frac")
      val d2 = r.getAs[Double]("dup_bigram_frac")
      val d3 = r.getAs[Double]("dup_trigram_frac")
      assert(tu > 0.0 && tu <= 1.0)
      assert(d2 >= 0.0 && d2 < 1.0)
      assert(d3 >= 0.0 && d3 < 1.0)
      // trigram duplication can't exceed bigram duplication on word soup
      // is NOT a theorem — but fractions must agree with the gate flag
      val pass = r.getAs[Int]("passes_gate")
      assert((pass == 1) == (tu <= 0.15 && d2 <= 0.05 && d3 <= 0.02))
    }
    // hand-checked extremes via the same expression path
    val hand = Seq((1L, "spam spam spam spam spam spam spam spam spam spam"),
                   (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    hand.createOrReplaceTempView("documents_t55_hand")
    val m = TextOps.t55Repetition(spark, dir) // touch the declared path
    assert(m.columns.toSeq == Seq("doc_id", "n_tokens", "top_unigram_frac",
      "dup_bigram_frac", "dup_trigram_frac", "passes_gate"))
    import org.apache.spark.sql.functions._
    val h = hand.select(col("doc_id"),
      (array_max(transform(array_distinct(split(col("text"), " ")),
        w => size(filter(split(col("text"), " "), x => x === w)))) /
        size(split(col("text"), " "))).as("tu")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(1L) == 1.0) // all-one-token doc: top unigram owns everything
    assert(h(2L) == 0.1) // all-distinct doc: 1/10
  }

  test("kgrams on sub-k-token docs: partial gram emitted, metrics total, SQL mirror clamps") {
    import spark.implicits._
    // The corpus never carries docs under 10 tokens, so the gate can't
    // exercise the sub-k edge: a 1- or 2-token doc where kgrams' tail
    // positions run off the array. concat_ws skips the nulls and emits
    // the PARTIAL gram — the metrics must stay total (no null fractions)
    // and the DuckDB mirror must agree, which it only does in the
    // clamping list-slice form (the earlier `t[i] || ' ' || t[i+1]`
    // NULL-propagated the whole gram; ADVICE r06).
    val planted = Seq((1L, "a"), (2L, "a b")).toDF("doc_id", "text")
    val m = TextOps.repetitionMetricsFrom(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Int]("n_tokens") == 1)
    assert(m(1L).getAs[Double]("top_unigram_frac") == 1.0)
    // one partial gram ("a"), fully distinct → duplication 0.0, not null
    assert(m(1L).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(m(1L).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(m(2L).getAs[Int]("n_tokens") == 2)
    assert(m(2L).getAs[Double]("top_unigram_frac") == 0.5)
    assert(m(2L).getAs[Double]("dup_bigram_frac") == 0.0)
    // k=3 over 2 tokens: the single partial gram "a b"
    assert(m(2L).getAs[Double]("dup_trigram_frac") == 0.0)
    // the mirror must stay in the clamping slice form — string-pin the
    // template since DuckDB can't run inside this suite
    val sql = TextOps.kgramsSql(3)
    assert(sql.contains("array_to_string") && sql.contains(": i + 2]"),
      s"kgramsSql must clamp via list-slice + array_to_string, got: $sql")
    assert(!sql.contains("||"),
      s"NULL-propagating concatenation reintroduced in kgramsSql: $sql")
  }

  test("t56 boilerplate: df-filtered grams only, boiler_frac consistent with keep flag") {
    val rows = TextOps.t56Boilerplate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_grams")
      val b = r.getAs[Long]("n_boiler")
      val f = r.getAs[Double]("boiler_frac")
      assert(b >= 0 && b <= n)
      assert(math.abs(f - b.toDouble / n) < 1e-12)
      assert((r.getAs[Int]("keep") == 1) == (f < 0.35))
    }
    // some docs must be on each side of the gate for it to mean anything
    assert(rows.exists(_.getAs[Int]("keep") == 1))
    assert(rows.exists(_.getAs[Int]("keep") == 0))
  }

  test("t57 sequence packing: offsets tile each source stream exactly, shards consistent") {
    val rows = TextOps.t57SequencePack(spark, dir).collect()
    assert(rows.nonEmpty)
    // per source: offsets are a gapless tiling [0, total) in doc_id order
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var expectStart = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_offset") == expectStart)
        assert(r.getAs[Long]("end_offset") ==
          expectStart + r.getAs[Long]("n_tokens"))
        expectStart = r.getAs[Long]("end_offset")
      }
    }
    rows.foreach { r =>
      val fs = r.getAs[Long]("first_shard")
      val ls = r.getAs[Long]("last_shard")
      assert(fs == r.getAs[Long]("start_offset") / 512)
      assert(ls == (r.getAs[Long]("end_offset") - 1) / 512)
      assert((r.getAs[Int]("spans_boundary") == 1) == (fs != ls))
    }
    // docs are ~10-100 tokens vs a 512 budget: boundary-spanning docs
    // must exist but must not dominate
    val spans = rows.count(_.getAs[Int]("spans_boundary") == 1)
    assert(spans > 0 && spans < rows.length / 2)
  }

  test("t58 vocab: per-lang ranks dense, counts non-increasing, coverage monotone to <=1") {
    val rows = TextOps.t58Vocab(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cnts = sorted.map(_.getAs[Long]("cnt"))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
      val cov = sorted.map(_.getAs[Double]("cum_frac"))
      assert(cov.zip(cov.tail).forall { case (a, b) => a < b })
      assert(cov.last <= 1.0 && cov.head > 0.0)
    }
  }

  test("t53 fingerprint: identical normalized text collides; distinct text does not") {
    import spark.implicits._
    val df = Seq(
      ("a", "en", "The  quick brown fox"),
      ("b", "en", "the quick  brown fox "), // same after normalization
      ("c", "en", "a completely different document body"))
      .toDF("doc_id", "lang", "text")
    df.write.mode("overwrite").parquet("/tmp/textops_spec_docs/documents.parquet")
    val fp = TextOps.t53Fingerprint(spark, "/tmp/textops_spec_docs").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp("a")._1 == fp("b")._1, "normalized duplicates share content_md5")
    assert(fp("a")._2 == fp("b")._2, "and share min shingle hash")
    assert(fp("a")._1 != fp("c")._1)
  }

  /** Naive interpolated-KN model over collected docs: (c2, c1, n1fwd,
    * n1bwd, B) and P_KN exactly as t77 defines them.
    */
  private def knModel(docs: Seq[(Long, Seq[String])]) = {
    val pairs = docs.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (id, p(0), p(1)))
    }
    val c2 = pairs.groupBy(p => (p._2, p._3)).view.mapValues(_.length.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1fwd = c2.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1bwd = c2.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val bt = c2.size.toLong
    def p(w1: String, w2: String): Double =
      math.max(c2.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0) / c1(w1).toDouble +
        (0.75 * n1fwd(w1).toDouble / c1(w1).toDouble) *
          (n1bwd.getOrElse(w2, 0L).toDouble / bt.toDouble)
    (pairs, c1, n1bwd, p _)
  }

  test("t77 KN scoring matches a naive recomputation") {
    val got = TextOps.t77KnLmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getBoolean(3))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq)).toSeq
    val (pairs, _, _, p) = knModel(docs)
    val lp = pairs.map(q => (q._2, q._3)).distinct
      .map(k => k -> math.floor(math.log(p(k._1, k._2)) * 1e9 + 0.5).toLong).toMap
    val perDoc = pairs.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.map(q => lp((q._2, q._3))).sum)
    }.toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = docs.map(_._1).sorted.map { id =>
      perDoc.get(id) match {
        case Some((nb, sn)) =>
          (id, nb, r6(sn.toDouble / nb.toDouble / 1e9), sn >= -3450000000L * nb)
        case None => (id, 0L, null, false)
      }
    }
    assert(got == want, s"first diff: ${got.zip(want).find(q => q._1 != q._2)}")
    assert(got.exists(_._4) && got.exists(!_._4),
      "the KN gate must separate the corpus, not rubber-stamp it")
  }

  test("t78 CCNet buckets match a naive per-language tercile recompute") {
    val got = TextOps.t78PerplexityBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getString(4))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq)).toSeq
    val (pairs, _, _, p) = knModel(docs.map(d => (d._1, d._3)))
    val lp = pairs.map(q => (q._2, q._3)).distinct
      .map(k => k -> math.floor(math.log(p(k._1, k._2)) * 1e9 + 0.5).toLong).toMap
    val alp = pairs.groupBy(_._1).view.mapValues { ps =>
      ps.map(q => lp((q._2, q._3))).sum.toDouble / ps.length.toDouble
    }.toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val ranked = ds.map(d => (d._1, alp(d._1))).sortBy { case (id, a) => (-a, id) }
      val n = ranked.length.toLong
      ranked.zipWithIndex.map { case ((id, a), ix) =>
        val bucket = ix.toLong * 3 / n + 1
        (id, lang, r6(a / 1e9), bucket,
          if (bucket == 1) "head" else if (bucket == 2) "middle" else "tail")
      }
    }.sortBy(_._1)
    assert(got == want, s"first diff: ${got.zip(want).find(q => q._1 != q._2)}")
    // equi-depth: per (lang) the three buckets differ by at most one doc,
    // and every head doc outscores every tail doc within its language
    for ((lang, rows) <- got.groupBy(_._2)) {
      val sizes = rows.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.size == 3 && sizes.values.max - sizes.values.min <= 1,
        s"$lang buckets must be equi-depth: $sizes")
      assert(rows.filter(_._5 == "head").map(_._3).min >=
        rows.filter(_._5 == "tail").map(_._3).max, s"$lang head must outscore tail")
    }
  }

  test("t77 KN is a PROPER conditional distribution: vocab-wide mass sums to 1 per context") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq)).toSeq
    val (pairs, c1, _, p) = knModel(docs)
    val vocab = docs.flatMap(_._2).distinct
    // five contexts spread across the frequency range
    val contexts = c1.keys.toSeq.sorted.grouped(math.max(1, c1.size / 5)).map(_.head).toSeq
    for (w1 <- contexts) {
      val mass = vocab.iterator.map(w2 => p(w1, w2)).sum
      assert(math.abs(mass - 1.0) < 1e-9,
        s"KN mass for context '$w1' must be exactly 1, got $mass")
    }
  }

  // -- t79: multi-round BPE -------------------------------------------

  /** Exact greedy BPE over a (word → count) vocabulary, symbols as real
    * token VECTORS — the reference semantics t79's sentinel-wrapped
    * literal replace must reproduce. Tie-break: count DESC, then the
    * space-joined pair ASC (valid against the wrapped election because
    * both ' ' and '>' sort below the lowercase alphabet, so prefix
    * symbols order first under either encoding).
    */
  private def naiveBpe(words: Map[String, Long], rounds: Int): Seq[(String, Long, Long)] = {
    var spell: Map[String, (Vector[String], Long)] =
      words.map { case (w, c) => w -> (w.toVector.map(_.toString), c) }
    (1 to rounds).map { _ =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((_, (syms, c)) <- spell; i <- 0 until syms.size - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((a, b), cnt) = pc.toSeq.minBy { case ((x, y), c) => (-c, s"$x $y") }
      spell = spell.map { case (w, (syms, c)) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
          else { out += syms(i); i += 1 }
        }
        w -> (out.result(), c)
      }
      val symsAfter = spell.values.map { case (s, c) => s.size * c }.sum
      (s"$a $b", cnt, symsAfter)
    }
  }

  test("t79 merge table ≡ exact greedy BPE on the real vocabulary, all rounds") {
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = naiveBpe(words, 3)
    val got = TextOps.t79BpeTrain(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"got $got\nwant $want")
    // round 1 must agree with t68's single-round election
    val t68 = TextOps.t68BpeMergeRound(spark, dir).head()
    assert(t68.getString(2) == want.head._1 && t68.getLong(3) == want.head._2)
  }

  test("t79 sentinel wrapping: multi-char symbols never false-match; runs merge pairwise") {
    val d = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val s = spark; import s.implicits._
    // vocab {ab:10, bc:5, abc:1, aaaa:1} plants both literal-replace
    // hazards. False-match: round 1 merges (a,b), so 'abc' spells
    // [ab, c]; round 2 elects (b,c) — a bare space-join spelling 'ab c'
    // CONTAINS 'b c' and would merge across the symbol boundary,
    // collapsing 'abc' a round early (and leaving round 3 with the
    // wrong elections everywhere). Run merge: round 3 elects (a,a) and
    // 'aaaa' must become [aa, aa] — a replace variant that consumes the
    // separator (padded patterns) leaves [aa, a, a].
    Seq((1L, "ab ab ab ab ab ab ab ab ab ab"), (2L, "bc bc bc bc bc abc aaaa"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = TextOps.t79BpeTrain(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val hand = Seq((1, "a b", 11L, 26L), (2, "b c", 5L, 21L), (3, "a a", 3L, 19L))
    assert(got == hand, s"got $got\nwant $hand")
    val words = Map("ab" -> 10L, "bc" -> 5L, "abc" -> 1L, "aaaa" -> 1L)
    val want = naiveBpe(words, 3).zipWithIndex
      .map { case ((p, c, sa), i) => (i + 1, p, c, sa) }
    assert(got == want, s"got $got\nnaive $want")
  }

  // -- t80: Heaps' law ------------------------------------------------

  /** First-occurrence vocabulary curve + OLS fit recomputed serially in
    * the same (doc_id, position) order.
    */
  private def naiveHeaps(texts: Seq[(Long, String)]): (Seq[(Long, Long, Long)], Double) = {
    val stream = texts.sortBy(_._1).flatMap(_._2.split(" "))
    val t = stream.size.toLong
    val seen = scala.collection.mutable.Set[String]()
    val firstCount = new Array[Long](stream.size + 1)
    for ((w, i) <- stream.zipWithIndex) {
      if (!seen.contains(w)) seen += w
      firstCount(i + 1) = seen.size.toLong
    }
    val pts = (1L to 10L).map { c =>
      val nc = c * t / 10
      (c, nc, firstCount(nc.toInt))
    }
    def snap(v: Double) = math.floor(v * 1e6 + 0.5)
    val xs = pts.map(p => snap(math.log(p._2.toDouble)))
    val ys = pts.map(p => snap(math.log(p._3.toDouble)))
    val n = pts.size.toDouble
    val beta = (n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum) /
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    (pts, beta)
  }

  test("t80 vocabulary curve ≡ serial first-occurrence replay; corpus saturates flat") {
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (pts, beta) = naiveHeaps(texts)
    val got = TextOps.t80HeapsLaw(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == pts,
      s"checkpoint curve: ${got.toSeq} vs $pts")
    assert(math.abs(got.head._4 - beta) < 1e-6, s"beta ${got.head._4} vs $beta")
    // the synthetic 31-word corpus is the degenerate flat case — the
    // diagnostic this operator exists to flag
    assert(got.head._4 == 0.0 && got.forall(_._3 == got.head._3))
  }

  test("t80 planted growing corpus fits 0 < beta < 1 with a strictly rising curve") {
    val d = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    val s = spark; import s.implicits._
    // doc i introduces i fresh words then repeats the first word i
    // times: vocabulary grows ~sqrt(total tokens), the Heaps regime
    val docsPlanted = (1 to 40).map { i =>
      val fresh = (1 to i).map(j => s"w${i}_$j")
      val filler = Seq.fill(i)("w1_1")
      (i.toLong, (fresh ++ filler).mkString(" "))
    }
    docsPlanted.toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = TextOps.t80HeapsLaw(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val (pts, beta) = naiveHeaps(docsPlanted)
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == pts)
    assert(math.abs(got.head._4 - beta) < 1e-6)
    assert(got.head._4 > 0.0 && got.head._4 < 1.0, s"beta ${got.head._4}")
    val vocabs = got.sortBy(_._1).map(_._3)
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => a < b }, "curve must rise")
  }
}
