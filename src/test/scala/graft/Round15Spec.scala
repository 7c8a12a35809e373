package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Increments, Multimodal, Similarity, TextOps}

/** Round-15 contracts: durable state for the incremental folds
  * (VERDICT r14 item 1) and the empty-corpus guards (ADVICE r14).
  *
  *  - Parquet round-trip exactness per family: saving a fold's state
  *    and loading it back reproduces the index/pair/model frames
  *    row-for-row (the durable frames are longs, md5 strings, and
  *    float/long arrays — every one binary-exact in parquet).
  *  - Resume ≡ in-memory: the resumed queries (d66/d67/m71) equal
  *    their in-job incremental siblings (d63/d64/m70) exactly. The
  *    driver's oracle gate additionally proves resume ≡ from-scratch
  *    cross-engine (same verbatim SQL), so this pin closes the
  *    triangle: from-scratch ≡ in-memory fold ≡ resumed fold.
  *  - Empty corpora fold as one empty batch (no NPE on max(id) = NULL)
  *    and resolve to empty results.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map {
      case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
      case v => String.valueOf(v)
    }.mkString("|")).toSet

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r15_$tag").toString

  // ------------------------------------------------- parquet round-trips
  test("near-dup band-index state round-trips parquet exactly") {
    val batches = Increments.monotoneHalves(Tables.documents(spark, dir), "doc_id")
    val s1 = Dedup.advanceNeardup(Dedup.NearDupState(null, null), batches.head)
    val path = tempDir("d66")
    try {
      Dedup.saveNeardupState(s1, path)
      val back = Dedup.loadNeardupState(spark, path)
      assert(rowSet(back.index) == rowSet(s1.index), "band index must round-trip")
      assert(rowSet(back.pairs) == rowSet(s1.pairs), "pair list must round-trip")
      assert(s1.index.count() > 0)
    } finally Increments.deleteRecursively(path)
  }

  test("semdedup quantizer + cell-index state round-trips parquet exactly") {
    graft.functions.Vectors.register(spark)
    val raw = Tables.embeddings(spark, dir)
    val cents = Similarity.sampleCentroids(raw)
    val batches = Increments.monotoneHalves(raw, "vec_id")
    val s1 = Similarity.advanceSemDedup(
      Similarity.SemDedupState(cents, null, null), batches.head)
    val path = tempDir("d67")
    try {
      Similarity.saveSemDedupState(s1, path)
      val back = Similarity.loadSemDedupState(spark, path)
      assert(rowSet(back.cents) == rowSet(s1.cents),
        "frozen quantizer (float vectors) must round-trip bit-exactly")
      assert(rowSet(back.index) == rowSet(s1.index), "cell index must round-trip")
      assert(rowSet(back.dups) == rowSet(s1.dups), "dup minima must round-trip")
    } finally Increments.deleteRecursively(path)
  }

  test("phash band-index state round-trips parquet exactly") {
    val img = Multimodal.mediaTable(spark, dir)
      .where(col("meta.format").isin("png", "jpeg"))
      .select(col("media_id"),
        org.apache.spark.sql.functions.decode(col("media"), "UTF-8").as("text"))
    val batches = Increments.monotoneHalves(img, "media_id")
    val s1 = Multimodal.advancePhash(Multimodal.PhashState(null, null), batches.head)
    val path = tempDir("m71")
    try {
      Multimodal.savePhashState(s1, path)
      val back = Multimodal.loadPhashState(spark, path)
      assert(rowSet(back.index) == rowSet(s1.index), "phash index must round-trip")
      assert(rowSet(back.pairs) == rowSet(s1.pairs), "pair list must round-trip")
    } finally Increments.deleteRecursively(path)
  }

  // -------------------------------------------- resume ≡ in-memory fold
  test("resumed near-dup fold equals the in-memory incremental fold") {
    assert(rowSet(Dedup.d66ResumedNeardup(spark, dir))
      == rowSet(Dedup.d63IncrementalNeardup(spark, dir)))
  }

  test("resumed semdedup fold equals the in-memory incremental fold") {
    assert(rowSet(Similarity.d67ResumedSemDedup(spark, dir))
      == rowSet(Similarity.d64IncrementalSemDedup(spark, dir)))
  }

  test("resumed phash fold equals the in-memory incremental fold") {
    assert(rowSet(Multimodal.m71ResumedPhash(spark, dir))
      == rowSet(Multimodal.m70IncrementalPhash(spark, dir)))
  }

  test("3-batch incremental topic fold equals from-scratch d65") {
    graft.functions.Vectors.register(spark)
    val raw = Tables.embeddings(spark, dir)
    val mx = raw.agg(org.apache.spark.sql.functions.max(col("vec_id"))).head().getLong(0)
    val batches = Seq(
      raw.filter(col("vec_id") <= mx / 3),
      raw.filter(col("vec_id") > mx / 3 && col("vec_id") <= 2 * mx / 3),
      raw.filter(col("vec_id") > 2 * mx / 3))
    val folded = Similarity.topicClustersOf(batches.foldLeft(
      Similarity.TopicState(Similarity.sampleCentroids(raw), null, null))(
      Similarity.advanceTopics))
    assert(rowSet(folded) == rowSet(Similarity.d65KnnTopicClusters(spark, dir)),
      "a 3-advance fold must equal the from-scratch run (deltas are final)")
  }

  test("3-batch incremental prep fold equals from-scratch c72") {
    val docs = Tables.documents(spark, dir)
    val mx = docs.agg(org.apache.spark.sql.functions.max(col("doc_id"))).head().getLong(0)
    val batches = Seq(
      docs.filter(col("doc_id") <= mx / 3),
      docs.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
      docs.filter(col("doc_id") > 2 * mx / 3))
    val boiler = TextOps.boilerModelFrom(docs, TextOps.boilerMinDf(spark, dir))
    val folded = batches.foldLeft(Curation.emptyPrepState(spark))(
      Curation.advancePrep(_, _, boiler)).packed
    assert(rowSet(folded) == rowSet(Curation.c72PrepPipeline(spark, dir)),
      "dedup ∩ gates → packing must fold exactly (frozen boiler model, final offsets)")
  }

  // ---------------------------------------------- empty-corpus guards
  test("monotoneHalves folds an empty corpus as one empty batch (no NPE)") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batches = Increments.monotoneHalves(empty, "doc_id")
    assert(batches.length == 1 && batches.head.isEmpty)
    assert(Dedup.incrementalNeardupClusters(batches).isEmpty,
      "empty fold must resolve to zero clusters")
  }

  test("empty media corpus folds to zero phash clusters (no NPE)") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("media_id", "text")
    assert(Multimodal.incrementalPhashClusters(Seq(empty)).isEmpty)
  }
}
