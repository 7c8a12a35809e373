package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextOps}

/** Semantics of t81 (BPE encode) and q108 (dimension-ablation recall).
  * t81 is pinned two ways: a planted two-word corpus whose three merge
  * rounds and final encodings are derived by hand, and the cross-operator
  * conservation law — the corpus-wide token total after encoding must
  * equal the symbol count t79's final training round reports, since both
  * count the same merged spellings. q108 is recomputed naively from the
  * collected embeddings.
  */
class BpeAblationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("t81 planted corpus: hand-derived merges and encodings") {
    // words: "abc"×3, "ad"×1. Merges (count desc, pair asc):
    //   r1: (a,b)  — "abc" → [ab, c]      symbols after: 2·3 + 2·1 = 8
    //   r2: (ab,c) — "abc" → [abc]        symbols after: 1·3 + 2·1 = 5
    //   r3: (a,d)  — "ad"  → [ad]         symbols after: 1·3 + 1·1 = 4
    val d = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val s = spark; import s.implicits._
    Seq((0L, "abc abc"), (1L, "abc ad"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val train = TextOps.t79BpeTrain(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(train.toSeq == Seq(
      (1, "a b", 3L, 8L), (2, "ab c", 3L, 5L), (3, "a d", 1L, 4L)))
    val enc = TextOps.t81BpeEncode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc0 = "abc abc": 2 words → 2 tokens, 6 chars → 3.0 chars/token
    // doc1 = "abc ad":  2 words → 2 tokens, 5 chars → 2.5
    assert(enc.toSeq == Seq((0L, 2L, 2L, 3.0), (1L, 2L, 2L, 2.5)))
  }

  test("t81 conserves t79's final symbol count over the real corpus") {
    val symsAfterFinal = TextOps.t79BpeTrain(spark, dir).collect()
      .maxBy(_.getInt(0)).getLong(3)
    val totalTokens = TextOps.t81BpeEncode(spark, dir).collect()
      .map(_.getLong(2)).sum
    assert(totalTokens == symsAfterFinal,
      s"encode total $totalTokens must equal train's final syms_after $symsAfterFinal")
  }

  test("t81 word counts re-add to the corpus token count") {
    val nWords = TextOps.t81BpeEncode(spark, dir).collect().map(_.getLong(1)).sum
    val corpusWords = Tables.documents(spark, dir)
      .selectExpr("size(split(text, ' ')) AS n").collect().map(_.getInt(0).toLong).sum
    assert(nWords == corpusWords)
  }

  // ------------------------------------------------- t98/t99 budget BPE
  private def plantedCorpus(): org.apache.spark.sql.DataFrame = {
    val s = spark; import s.implicits._
    // words: "abc"×3, "ad"×1; alphabet {a,b,c,d} = 4. Greedy merges:
    //   r1 (a,b) 3 → syms 8; r2 (ab,c) 3 → syms 5; r3 (a,d) 1 → syms 4;
    //   r4: every word one symbol — pair exhaustion.
    Seq((0L, "abc abc"), (1L, "abc ad")).toDF("doc_id", "text")
  }

  test("t98 budget stop: |V|=6 over a 4-char alphabet runs exactly 2 rounds") {
    val (_, reports) = TextOps.bpeBudgetFold(spark, plantedCorpus(), 6)
    assert(reports.map(m =>
      (m.round, m.pair, m.pairCount, m.symsAfter, m.vocabSize)) == Seq(
      (1, "a b", 3L, 8L, 5L), (2, "ab c", 3L, 5L, 6L)))
  }

  test("t98 budget stop: budget at/below the alphabet trains zero rounds") {
    val (vocab, reports) = TextOps.bpeBudgetFold(spark, plantedCorpus(), 4)
    assert(reports.isEmpty)
    // the untrained vocabulary is the sentinel-wrapped character spelling
    val spaced = vocab.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(spaced == Map("abc" -> "<a> <b> <c>", "ad" -> "<a> <d>"))
  }

  test("t98 exhaustion stop: a generous budget halts when no pairs remain") {
    val (vocab, reports) = TextOps.bpeBudgetFold(spark, plantedCorpus(), 24)
    assert(reports.map(m => (m.round, m.pair, m.pairCount, m.symsAfter)) == Seq(
      (1, "a b", 3L, 8L), (2, "ab c", 3L, 5L), (3, "a d", 1L, 4L)))
    val spaced = vocab.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(spaced == Map("abc" -> "<abc>", "ad" -> "<ad>"))
  }

  test("t98's first three merges equal t79's on the corpus") {
    val budget = TextOps.t98BpeBudgetTrain(spark, dir).collect()
      .filter(_.getInt(0) <= 3)
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val fixed = TextOps.t79BpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(budget == fixed,
      "the budget trainer's prefix must agree with the 3-round trainer")
  }

  test("t99 vs t81: more merges never lengthen any document's encoding") {
    val at3 = TextOps.t81BpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val atBudget = TextOps.t99BpeBudgetEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(at3.keySet == atBudget.keySet)
    at3.foreach { case (doc, (nWords3, nToks3)) =>
      val (nWordsB, nToksB) = atBudget(doc)
      assert(nWordsB == nWords3, s"doc $doc word count must not change")
      assert(nToksB <= nToks3,
        s"doc $doc: budget encoding $nToksB must be <= 3-round $nToks3")
    }
    assert(atBudget.values.map(_._2).sum < at3.values.map(_._2).sum,
      "13 extra merges must shorten the corpus encoding overall")
  }

  test("t99 conserves t98's final symbol count over the real corpus") {
    val symsAfterFinal = TextOps.t98BpeBudgetTrain(spark, dir).collect()
      .maxBy(_.getInt(0)).getLong(3)
    val totalTokens = TextOps.t99BpeBudgetEncode(spark, dir).collect()
      .map(_.getLong(2)).sum
    assert(totalTokens == symsAfterFinal,
      s"encode total $totalTokens must equal train's final syms_after $symsAfterFinal")
  }

  test("q108 matches a naive truncated-recall recompute; full dim is exact recall 1") {
    val vecs = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def topk(d: Int, q: Long): Seq[Long] = {
      val qe = vecs(q).take(d)
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          val ve = v.take(d)
          val dot = qe.zip(ve).map(p => p._1 * p._2).sum
          val sim = dot / (math.sqrt(qe.map(x => x * x).sum) * math.sqrt(ve.map(x => x * x).sum))
          (id, sim)
        }
        .sortBy { case (id, sim) => (-sim, id) }.take(5).map(_._1)
    }
    val queries = 0L until 10L
    val truth = queries.map(q => q -> topk(64, q).toSet).toMap
    val got = Similarity.q108DimAblation(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3))).toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(8, 16, 32, 64))
    for ((d, hits, recall) <- got) {
      val naiveHits = queries.map(q => topk(d, q).count(truth(q))).sum
      assert(hits == naiveHits.toLong, s"dim $d hits: got $hits want $naiveHits")
      assert(math.abs(recall - naiveHits / 50.0) < 1e-9, s"dim $d recall")
    }
    assert(got.last == ((64, 50L, 1.0)), "full-dimension row is its own ground truth")
  }
}
