package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** d58 intra-corpus exact substring dedup (Lee et al. span-level
  * operator): planted duplicate spans resolve to exactly the copied
  * token ranges with first-occurrence-keeps semantics, and the corpus
  * run matches a naive in-memory recomputation of window hashes →
  * keeper election → interval union.
  */
class SubstringSpanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val L = 10 // Dedup.SpanL

  private def spans(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    Dedup.substringSpansFrom(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  test("planted cross-doc copy: only the LATER doc carries the span, covering the copied range") {
    val base = (1 to 30).map(i => s"u$i")
    val copied = base.slice(4, 20) // u5..u20, 16 tokens
    val docA = base.mkString(" ")
    // docB: 10 unique tokens, then the copied run at positions 11..26
    val docB = ((1 to 10).map(i => s"v$i") ++ copied).mkString(" ")
    val docC = (1 to 40).map(i => s"w$i").mkString(" ") // unique, no spans
    val got = spans(Seq((1L, docA), (2L, docB), (3L, docC)))
    // windows fully inside B's copied range: starts 11..17 (7 windows),
    // all non-first (doc 1 holds the same windows at starts 5..11) →
    // one merged span [11, 26] of 16 tokens
    assert(got == Seq((2L, 11L, 26L, 16L, 7L)),
      s"expected exactly doc 2's copied range, got $got")
  }

  test("self-repetition within one doc: second and later periods merge to one span") {
    // 4 repeats of a 5-token phrase: windows at starts 1..11; start p and
    // p+5 hash equal, so keepers are starts 1..5 and dups 6..11 → span
    // [6, 20] (15 tokens, 6 windows)
    val doc = Seq.fill(4)((1 to 5).map(i => s"x$i")).flatten.mkString(" ")
    val got = spans(Seq((1L, doc)))
    assert(got == Seq((1L, 6L, 20L, 15L, 6L)), s"got $got")
  }

  test("sub-L docs and near-misses produce no spans") {
    val short = (1 to L - 1).map(i => s"s$i").mkString(" ") // no full window
    // 9-token shared run: no full L-window ever repeats
    val a = ((1 to 9).map(i => s"c$i") ++ Seq("a1", "a2")).mkString(" ")
    val b = ((1 to 9).map(i => s"c$i") ++ Seq("b1", "b2")).mkString(" ")
    assert(spans(Seq((1L, short), (2L, short), (3L, a), (4L, b))).isEmpty)
  }

  /** Naive span recompute: every window occurrence, first occurrence per
    * window text elected in (doc_id, pos) order, remaining positions
    * union-merged — (doc_id, start, end, span_tokens, n_windows) rows.
    */
  private def naiveSpans(docs: Seq[(Long, Array[String])]) = {
    val occ = for {
      (id, t) <- docs if t.length >= L
      p <- 1 to (t.length - L + 1)
    } yield (t.slice(p - 1, p - 1 + L).mkString(" "), id, p)
    val first = occ.groupBy(_._1).view.mapValues(_.map(o => (o._2, o._3)).min).toMap
    val dups = occ.filter { case (w, id, p) => first(w) != ((id, p)) }
    dups.groupBy(_._2).toSeq.flatMap { case (id, ds) =>
      val sorted = ds.map(_._3).sorted
      val islands = sorted.foldLeft(List.empty[List[Int]]) {
        case (acc @ (cur :: rest), p) =>
          // merge if the new window starts within (covered end + 1)
          if (p <= cur.head + L) (p :: cur) :: rest else List(p) :: acc
        case (Nil, p) => List(List(p))
      }
      islands.reverse.map { isl =>
        val ps = isl.reverse
        (id, ps.head.toLong, (ps.last + L - 1).toLong,
          (ps.last + L - 1 - ps.head + 1).toLong, ps.length.toLong)
      }
    }.sortBy(s => (s._1, s._2))
  }

  test("corpus spans match a naive recomputation at sf0.001") {
    val got = Dedup.d58SubstringSpans(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty, "the planted near-dups must share ≥L-token runs")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "))).toSeq
    assert(got == naiveSpans(docs))
  }

  test("c80 savings datasheet matches a naive composed recomputation at sf0.001") {
    val got = graft.operators.Curation.c80DedupSavings(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // d40 keeper election, then naive spans over the keeper corpus only
    val keepIds = rows.groupBy(_._3).values.map(_.map(_._1).min).toSet
    val spanByDoc = naiveSpans(rows.filter(r => keepIds(r._1))
        .map(r => (r._1, r._3.split(" "))).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val want = rows.groupBy(_._2).map { case (src, ds) =>
      val nTok = ds.map(_._3.split(" ").length.toLong).sum
      val dupToks = ds.filterNot(d => keepIds(d._1)).map(_._3.split(" ").length.toLong).sum
      val nDup = ds.count(d => !keepIds(d._1)).toLong
      val spanToks = ds.filter(d => keepIds(d._1)).map(d => spanByDoc.getOrElse(d._1, 0L)).sum
      src -> ((ds.length.toLong, nDup, nTok, dupToks, spanToks,
        nTok - dupToks - spanToks, (dupToks + spanToks).toDouble / nTok))
    }
    assert(got.keySet == want.keySet && got.nonEmpty)
    for ((src, w) <- want) assert(got(src) == w, s"source $src")
    // non-vacuous: span cuts fire at this SF; exact whole-doc dups only
    // exist in the sf0.1 generation (8 planted) — pin that branch there
    assert(want.values.map(_._5).sum > 0, "span cuts present")
    assert(want.values.map(_._2).sum == 0, "sf0.001 has no exact dups (generation fact)")
    val dupDocs01 = graft.operators.Curation
      .c80DedupSavings(spark, "/root/testdata/sf0.1").collect()
      .map(_.getLong(2)).sum
    assert(dupDocs01 == 8L, s"sf0.1 plants 8 exact dup docs, got $dupDocs01")
  }
}
