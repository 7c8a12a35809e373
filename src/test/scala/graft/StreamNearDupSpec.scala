package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.{NearDupClusterMaintainer, StreamNearDup}

/** Pins the streaming MinHash-LSH near-dup contract (StreamNearDup):
  *
  *  1. the narrow streaming signature/band projection equals the batch
  *     aggregate path row-for-row (so stream and batch agree on what a
  *     candidate IS);
  *  2. stream ≡ batch: an id-monotone multi-batch replay emits EXACTLY
  *     d42's (doc_a, doc_b, est_jaccard) pair set, each pair once (the
  *     first-colliding-band ownership rule replaces batch d42's
  *     groupBy(doc_a, doc_b) dedup);
  *  3. re-delivered documents are idempotent (no re-compare, no
  *     re-index) — the crawler-retry case.
  */
class StreamNearDupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def bandKey(r: org.apache.spark.sql.Row): String =
    s"${r.getLong(0)}|${r.getInt(2)}|${r.getString(3)}|${r.getSeq[Long](1).mkString(",")}"

  test("narrow streaming signature/band projection equals the batch aggregate path") {
    val docs = Tables.documents(spark, dir)
    val batch = Dedup.bandedSignaturesFrom(docs).collect().map(bandKey).toSet
    val stream = Dedup.streamBandedSignaturesFrom(docs).collect().map(bandKey).toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
  }

  /** Four planted docs: A≡B and C≡D are near-dup twins (identical text →
    * every band collides, est_jaccard = 1.0); the AB and CD families
    * share no shingles so they never meet.
    */
  private val twinA = (1L, "alpha beta gamma delta epsilon zeta")
  private val twinB = (2L, "alpha beta gamma delta epsilon zeta")
  private val twinC = (3L, "one two three four five six seven")
  private val twinD = (4L, "one two three four five six seven")

  /** Note (the StateTtlSpec discipline): TTL switches the operator to
    * TimeMode.ProcessingTime, under which the engine runs (possibly
    * empty) micro-batches every trigger to advance the expiry clock —
    * `processAllAvailable` never observes a quiescent stream, so these
    * tests poll the memory sink for an expected emission instead.
    */
  private def awaitRows(table: String, n: Long, timeoutMs: Long = 60000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (spark.table(table).count() < n) {
      assert(System.nanoTime() < deadline,
        s"timed out waiting for $n rows in $table (have ${spark.table(table).count()})")
      Thread.sleep(100)
    }
  }

  /** Two more disjoint twin families — batch-completion markers for the
    * eviction test (each family's identical pair emits within its own
    * micro-batch, proving that batch fully processed).
    */
  private val twinE = (7L, "red orange yellow green blue indigo")
  private val twinF = (8L, "red orange yellow green blue indigo")
  private val twinG = (9L, "north south east west up down middle")
  private val twinH = (10L, "north south east west up down middle")

  test("TTL: an idle bucket evicts — a twin arriving after the horizon finds no index") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, String)]
      val pairs = StreamNearDup(input.toDF().toDF("doc_id", "text"),
        ttl = Some(java.time.Duration.ofMillis(500)))
      val ckpt = java.nio.file.Files.createTempDirectory("graft_snd_ttl").toString
      val q = pairs.writeStream.format("memory").queryName("snd_ttl_evict")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        // batch 1: A plus the E/F marker twins — their pair proves A's
        // batch committed BEFORE the expiry sleep starts (ADVICE r14:
        // without the marker, a delayed batch 1 could land A and B in
        // the SAME micro-batch and emit their pair)
        input.addData(twinA, twinE, twinF)
        awaitRows("snd_ttl_evict", 1)
        Thread.sleep(4000) // 8× the TTL: A's bucket state expires
        // batch 2: B meets A's evicted bucket; C/D pair within-batch
        input.addData(twinB, twinC, twinD)
        awaitRows("snd_ttl_evict", 2)
        // batch 3: the G/H marker — batches commit IN ORDER, so once
        // this later batch's pair is visible, batch 2's outputs are
        // complete and any (A,B) emission would already have landed
        // (no wall-clock grace window; ADVICE r14)
        input.addData(twinG, twinH)
        awaitRows("snd_ttl_evict", 3)
        val got = spark.table("snd_ttl_evict").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == Set((7L, 8L), (3L, 4L), (9L, 10L)),
          s"A's evicted bucket must not pair with B; the long tail belongs to the batch sweep — got $got")
      } finally q.stop()
    }
  }

  test("cluster maintainer: folded labels equal d45 over the pairs seen, per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val cut1 = docs.length / 3
    val cut2 = 2 * docs.length / 3
    val slices = Seq(docs.slice(0, cut1), docs.slice(cut1, cut2), docs.drop(cut2))
    withRocksDb {
      val input = MemoryStream[(Long, String)]
      val maintainer = new NearDupClusterMaintainer(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_snd_cc").toString
      val q = maintainer.attach(StreamNearDup(input.toDF().toDF("doc_id", "text")))
        .option("checkpointLocation", ckpt).start()
      try {
        var delivered = Seq.empty[(Long, String)]
        var sawNonEmpty = false
        slices.foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
          delivered ++= b
          // from-scratch resolution over the SAME pair set: d42's pairs
          // among the delivered prefix, resolved by d45's components
          val expected = Dedup.connectedComponents(
            Dedup.minhashNearDupPairsFrom(
              delivered.toDF("doc_id", "text")), "doc_a", "doc_b")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val got = maintainer.labels
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          assert(got == expected,
            s"after ${delivered.size} docs: folded labels must equal the from-scratch resolution")
          if (expected.nonEmpty) sawNonEmpty = true
        }
        assert(sawNonEmpty, "fixture must exercise non-trivial clusters")
      } finally q.stop()
    }
  }

  test("a binding band-bucket cap fails the query loudly (never silent pair loss)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, String)]
      val pairs = StreamNearDup(input.toDF().toDF("doc_id", "text"), maxBucket = 1)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_snd_cap").toString
      val q = pairs.writeStream.format("memory").queryName("snd_cap")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          input.addData(twinA, twinB)
          q.processAllAvailable()
        }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
        assert(messages(ex).exists(_.contains("band-bucket cap 1 binds")),
          s"expected the loud cap message in the failure chain — got ${messages(ex)}")
      } finally q.stop()
    }
  }

  test("TTL: within a generous horizon the twin pair still emits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, String)]
      val pairs = StreamNearDup(input.toDF().toDF("doc_id", "text"),
        ttl = Some(java.time.Duration.ofHours(1)))
      val ckpt = java.nio.file.Files.createTempDirectory("graft_snd_ttl2").toString
      val q = pairs.writeStream.format("memory").queryName("snd_ttl_retain")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        input.addData(twinA)
        input.addData(twinB)
        awaitRows("snd_ttl_retain", 1)
        val got = spark.table("snd_ttl_retain").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got == Set((1L, 2L, 1.0)),
          s"twins within the horizon must pair with est 1.0 — got $got")
      } finally q.stop()
    }
  }

  test("3-batch id-monotone replay emits exactly d42's pair set, once each") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val want = Dedup.d42MinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val cut1 = docs.length / 3
    val cut2 = 2 * docs.length / 3
    withRocksDb {
      val input = MemoryStream[(Long, String)]
      val pairs = StreamNearDup(input.toDF().toDF("doc_id", "text"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft_snd").toString
      val q = pairs.writeStream.format("memory").queryName("snd_replay")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        Seq(docs.slice(0, cut1), docs.slice(cut1, cut2), docs.drop(cut2))
          .foreach { b => input.addData(b: _*); q.processAllAvailable() }
        val got = spark.table("snd_replay").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got == want,
          s"stream-only: ${(got -- want).take(3)}; batch-only: ${(want -- got).take(3)}")
        // exactly-once: the sink row count equals the pair-set size
        assert(spark.table("snd_replay").count() == want.size.toLong)
        // idempotent re-delivery: replaying batch 1 adds nothing
        input.addData(docs.slice(0, cut1): _*)
        q.processAllAvailable()
        assert(spark.table("snd_replay").count() == want.size.toLong,
          "re-delivered docs must not re-emit pairs")
      } finally q.stop()
    }
  }
}
