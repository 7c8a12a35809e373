package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FileSink

/** Exactly-once accounting for the streaming parquet sink (FileSink):
  * a crash in the window AFTER the epoch directory is written but
  * BEFORE the engine commits the batch must, on restart, replay the
  * same batchId over the same input slice and overwrite — never
  * duplicate, never lose an epoch. This is the sandbox-testable
  * equivalent of the reference's Kafka sink commit semantics (K3).
  */
class FileSinkReplaySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  test("kill between sink write and commit: epoch replayed once, nothing lost or duplicated") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_fsink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fsink_ckpt").toString
    val input = MemoryStream[(String, Double)]
    def stream = input.toDF().toDF("readTag_id", "value")

    // Run 1: batch 0 commits normally; batch 1 writes its epoch
    // directory, then "crashes" before the engine can commit it.
    val crashOnce = new AtomicBoolean(true)
    val q1 = FileSink.startStatsParquetSink(stream, col("readTag_id"),
      col("value"), outDir, ckpt,
      afterWrite = id =>
        if (id == 1 && crashOnce.getAndSet(false))
          throw new RuntimeException("injected crash before batch commit"))
    input.addData(("a", 1.0), ("b", 2.0))
    q1.processAllAvailable()
    input.addData(("a", 3.0))
    val died = intercept[Exception] { q1.processAllAvailable() }
    assert(died.getMessage != null)
    q1.stop()
    // The uncommitted epoch IS on disk — the dangerous half-written state.
    assert(new java.io.File(s"$outDir/epoch=1").exists())

    // Run 2: same checkpoint + source. The engine must replay batch 1
    // (same id, same input slice), overwrite epoch=1, then move on.
    val q2 = FileSink.startStatsParquetSink(stream, col("readTag_id"),
      col("value"), outDir, ckpt)
    try {
      q2.processAllAvailable() // replays the uncommitted batch 1
      input.addData(("b", 4.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = FileSink.readEpochs(spark, outDir)
      .select("epoch", "readTag_id", "counter", "summer")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // Exactly these emissions — each epoch exactly once, cumulative
    // state correct across the crash/replay boundary:
    assert(rows == Set(
      (0L, "a", 1L, 1.0), (0L, "b", 1L, 2.0), // epoch 0: both keys new
      (1L, "a", 2L, 4.0),                      // epoch 1 (replayed once)
      (2L, "b", 2L, 6.0)))                     // epoch 2: post-recovery
    // No epoch directory beyond the committed set.
    val epochDirs = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName).toSet
    assert(epochDirs == Set("epoch=0", "epoch=1", "epoch=2"))
  }
}
