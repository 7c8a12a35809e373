package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 contracts (ADVICE r16 regressions, pinned).
  *
  *  - '''Checkpoint run-dir idempotence is path-qualified.''' A base
  *    spelled `file:///x` qualifies differently than it was written, so
  *    the old substring check minted a fresh `graft-<uuid>` run dir per
  *    `graftCheckpoint` call — breaking the "one per-run subdir is the
  *    cleanup unit" contract exactly for the URI-form bases a real
  *    cluster uses. The pin runs two checkpointing queries under a
  *    `file://` base and requires exactly ONE run subdir.
  *  - '''Kafka topic lists are normalized at parse time.''' `bms,,x`
  *    or ` ,bms` used to pass verbatim into the DSv2 `subscribe` option
  *    and only fail at stream start.
  *  - '''ScaleLadder replica 0 is verbatim''', embeddings included: the
  *    renormalize step used to re-divide replica-0 vectors by their
  *    recomputed norm (≈1 but not exactly), drifting source vectors by
  *    1 ulp and perturbing exact-duplicate structure at ladder SFs.
  */
class Round17Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("file:// checkpoint base mints exactly one run dir across calls") {
    val base = java.nio.file.Files.createTempDirectory("graft_r17_uri").toString
    spark.conf.set("spark.graft.checkpointDir", s"file://$base")
    try {
      SparkEntry.queries("q152_label_propagation")(spark, dir).count()
      SparkEntry.queries("t98_bpe_budget_train")(spark, dir).count()
      val runs = Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("graft-"))
      assert(runs.length == 1,
        s"expected one graft- run subdir under file://$base, got ${runs.length}")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("kafkaParts normalizes malformed topic lists") {
    val c = graft.jobs.JobConfig.parse(Array(
      "--source", "kafka://h:9092/bms,,x,", "--sink", "kafka://h:9092/out"))
    assert(c.kafkaParts("kafka://h:9092/bms,,x,") == ("h:9092", "bms,x"))
    assert(c.kafkaParts("kafka://h:9092/ ,bms") == ("h:9092", "bms"))
    intercept[IllegalArgumentException] { c.kafkaParts("kafka://h:9092/ , ") }
  }

  test("ScaleLadder replica-0 rows are verbatim (embeddings bit-identical)") {
    val out = java.nio.file.Files.createTempDirectory("graft_r17_ladder").toString
    val nanosBefore = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    ScaleLadder.gen(spark, dir, out, 2)
    val src = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rep0 = spark.read.parquet(s"$out/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .where(s"vec_id < ${src.keys.max + 1}").collect()
    assert(rep0.nonEmpty)
    rep0.foreach { r =>
      assert(r.getSeq[Float](1) == src(r.getLong(0)),
        s"replica-0 vec ${r.getLong(0)} must be bit-identical to the source")
    }
    // the nanos session override must not leak out of gen(): whatever
    // the session carried before (Tables.events may have set it) is
    // restored, never unconditionally left at "true"
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") == nanosBefore)
  }
}
