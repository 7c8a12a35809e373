package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Semantics of the round-9 text operators (t71 entropy/TTR gate, t72 RAG
  * chunking), which shipped with only the DuckDB hash gate. These pin the
  * MEANING: t71 against a naive per-doc histogram recompute plus planted
  * zero-entropy / TTR=1 documents, t72 against the gapless-tiling
  * invariant (stride-S starts, full-width interior chunks, last chunk
  * closing exactly at n) plus a JVM md5 recompute on a planted doc.
  */
class EntropyChunkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  // W/S mirror TextOps' chunker constants; the spec re-derives every
  // invariant from these two numbers so a constant change fails loudly.
  private val W = 32
  private val S = 24

  /** Planted documents table: doc 1 single-symbol (entropy exactly 0),
    * doc 2 all-unique tokens (TTR exactly 1), doc 3 a known short doc
    * for the md5 recompute (< W tokens → exactly one chunk).
    */
  lazy val plantedDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-entropy").toString
    val s = spark; import s.implicits._
    Seq(
      (1L, "aaaa", "en", "plant", 4L),
      (2L, "p q r s", "en", "plant", 7L),
      (3L, "alpha beta gamma delta", "en", "plant", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def naiveEntropy(syms: Seq[String]): Double = {
    val n = syms.size.toDouble
    val counts = syms.groupBy(identity).values.map(_.size.toDouble)
    (math.log(n) - counts.map(c => c * math.log(c)).sum / n) / math.log(2.0)
  }

  test("t71 matches a naive per-doc histogram recompute on the corpus") {
    val got = TextOps.t71Entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val texts = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == texts.keySet)
    for ((id, text) <- texts) {
      val toks = text.split(" ", -1).toSeq
      val chars = text.map(_.toString)
      val (ch, tk, ttr) = got(id)
      assert(math.abs(ch - naiveEntropy(chars)) < 1e-5, s"doc $id char_entropy")
      assert(math.abs(tk - naiveEntropy(toks)) < 1e-5, s"doc $id token_entropy")
      assert(math.abs(ttr - toks.distinct.size.toDouble / toks.size) < 1e-5,
        s"doc $id ttr")
    }
  }

  test("t71 planted docs: single-symbol entropy is exactly 0; all-unique TTR is 1") {
    val got = TextOps.t71Entropy(spark, plantedDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (ch1, tk1, ttr1) = got(1L)
    assert(ch1 == 0.0, "4×'a' char entropy must be exactly 0")
    assert(tk1 == 0.0, "one-token doc token entropy must be exactly 0")
    assert(ttr1 == 1.0)
    val (ch2, tk2, ttr2) = got(2L)
    assert(ttr2 == 1.0, "all-unique tokens must give TTR exactly 1")
    assert(tk2 == 2.0, "4 equiprobable tokens: H = log2(4) = 2")
    // "p q r s": 4 distinct letters + 3 spaces over 7 chars
    assert(math.abs(ch2 - naiveEntropy("p q r s".map(_.toString))) < 1e-5)
  }

  test("t71 per-row stream form ≡ batch explode+agg form on the corpus") {
    // same statistic, two shapes: the batch explode+hash-agg pass and the
    // stateless per-row projection the streaming path runs; both round
    // to 6 decimals, so they must agree within the rounding step
    val agg = TextOps.t71Entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val perRow = TextOps.entropyMetricsFrom(
        Tables.documents(spark, dir).select("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(agg.keySet == perRow.keySet)
    for ((id, (ch, tk, ttr)) <- agg) {
      val (ch2, tk2, ttr2) = perRow(id)
      assert(math.abs(ch - ch2) <= 1.1e-6, s"doc $id char_entropy")
      assert(math.abs(tk - tk2) <= 1.1e-6, s"doc $id token_entropy")
      assert(math.abs(ttr - ttr2) <= 1.1e-6, s"doc $id ttr")
    }
  }

  test("t72 chunks tile each doc gaplessly: stride-S starts, interior full-width, last closes at n") {
    val byDoc = TextOps.t72Chunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nToks = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap
    assert(byDoc.keySet == nToks.keySet)
    for ((id, rows) <- byDoc) {
      val n = nToks(id)
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong),
        s"doc $id chunk_ids must be 0..nc-1")
      for ((_, cid, start, len) <- sorted) {
        assert(start == cid * S, s"doc $id chunk $cid start")
        assert(len >= 1 && len <= W, s"doc $id chunk $cid width")
      }
      // interior chunks are full width; the last closes exactly at n —
      // together with stride S < W this is gapless cover of [0, n)
      val last = sorted.last
      assert(sorted.init.forall(_._4 == W), s"doc $id interior chunks full-width")
      assert(last._3 + last._4 == n, s"doc $id last chunk must end at n=$n")
      val expNc = if (n <= W) 1L else (n - W + S - 1) / S + 1
      assert(sorted.length.toLong == expNc, s"doc $id chunk count")
    }
  }

  test("t72 planted short doc: exactly one chunk whose md5 matches a JVM recompute") {
    val rows = TextOps.t72Chunks(spark, plantedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val doc3 = rows.filter(_._1 == 3L)
    assert(doc3.length == 1, "a <=W-token doc must produce exactly one chunk")
    val (_, cid, start, len, md5) = doc3.head
    assert(cid == 0L && start == 0L && len == 4L)
    val exp = MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma delta".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5 == exp, "chunk_md5 must be the md5 of the space-joined token window")
    // doc 1 ("aaaa") and doc 2 ("p q r s") are single-chunk too
    assert(rows.count(_._1 == 1L) == 1 && rows.count(_._1 == 2L) == 1)
  }
}
