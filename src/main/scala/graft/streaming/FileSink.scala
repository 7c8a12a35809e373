package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** End-to-end streaming FILE sink for the stats pipeline — the
  * sandbox-testable stand-in for the reference's Kafka sink (K3,
  * KafkaStreamAverageCalculator.java:185-199; no broker exists here, so
  * the commit protocol is exercised against parquet instead).
  *
  * Exactly-once contract: Update-mode aggregates can't use the built-in
  * parquet sink (append-only), so each epoch's updated-key rows go
  * through `foreachBatch` into `outDir/epoch=<batchId>/` with
  * `mode("overwrite")`. Structured Streaming's recovery guarantee is
  * that after a crash the LAST UNCOMMITTED batch is replayed with the
  * SAME batchId and the same input slice — so a partially-written or
  * fully-written-but-uncommitted epoch directory is simply overwritten,
  * never duplicated, and committed epochs are never re-run (batchId is
  * recorded in the checkpoint's commit log before the next trigger).
  * Idempotence therefore rides on (deterministic batch contents ×
  * keyed-by-batchId overwrite) — the standard Spark recipe for
  * non-transactional sinks. FileSinkReplaySpec kills a query between
  * sink write and commit and asserts no lost/duplicated epochs.
  *
  * At 100 TB: each epoch write is a distributed parquet job (one file
  * per shuffle partition of updated keys); the overwrite is scoped to
  * one epoch directory, so recovery cost is one epoch, not the table.
  *
  * @param afterWrite fault-injection/audit hook invoked after the epoch
  *   directory is written but BEFORE foreachBatch returns (i.e. before
  *   the engine commits the batch) — production default is a no-op;
  *   specs throw here to simulate a crash in the uncommitted window.
  */
object FileSink {

  def startStatsParquetSink(df: DataFrame, key: Column, value: Column,
                            outDir: String, checkpoint: String,
                            afterWrite: Long => Unit = _ => ()): StreamingQuery =
    RunningStats(df, key, value).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/epoch=$batchId")
        afterWrite(batchId)
      }
      .start()

  /** Reads every epoch directory back as one frame with an `epoch`
    * column (hive-style partition discovery on `epoch=N`).
    */
  def readEpochs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)
      .withColumn("epoch", col("epoch").cast("long"))
}
