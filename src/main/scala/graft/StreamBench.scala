package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.fidelity.StatefulStats
import graft.streaming.{RunningStats, Sources}

/** Streaming-pipeline benchmark (BASELINE.md streaming metrics): replays
  * the events table as a file stream through the cumulative stats
  * pipeline (the reference's job 1 shape) — BOTH forms: the declarative
  * aggregate (RunningStats) and the imperative byte-fidelity
  * transformWithState state machine (StatefulStats) — and reports rows/s
  * plus per-epoch latency. Prints ONE JSON line, same convention as
  * [[Bench]]; the declarative number is the primary metric, the fidelity
  * path's throughput rides along as `fidelity_rows_per_sec`.
  */
object StreamBench {

  /** Accumulates per-batch totals as they stream past — `recentProgress`
    * is a ring buffer (default 100 entries), so reading it after the run
    * undercounts rows/epochs on long runs while `elapsed` spans them all.
    */
  private final class Totals extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    var rows = 0L
    var epochs = 0L
    var batchMsSum = 0.0
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      if (e.progress.numInputRows > 0) synchronized {
        rows += e.progress.numInputRows
        epochs += 1
        batchMsSum += e.progress.durationMs.getOrDefault("triggerExecution", 0L).toDouble
      }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  /** (rows, epochs, avg epoch ms, wall sec) for one pipeline run. */
  private def runOnce(spark: org.apache.spark.sql.SparkSession,
                      stats: DataFrame, name: String): (Long, Long, Double, Double) = {
    val totals = new Totals
    spark.streams.addListener(totals)
    val t0 = System.nanoTime()
    val q = stats.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    q.processAllAvailable()
    val elapsed = (System.nanoTime() - t0) / 1e9
    // progress events are posted async: wait until the listener has gone
    // quiet (two identical reads 100 ms apart) before taking the totals
    var prev = -1L
    var cur = totals.synchronized(totals.rows)
    var spins = 0
    while (cur != prev && spins < 50) {
      Thread.sleep(100); prev = cur; cur = totals.synchronized(totals.rows); spins += 1
    }
    spark.streams.removeListener(totals)
    val (rows, epochs, ms) =
      totals.synchronized((totals.rows, totals.epochs, totals.batchMsSum))
    q.stop()
    (rows, epochs, if (epochs > 0) ms / epochs else 0.0, elapsed)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val (rows, epochs, avgBatch, elapsed) = runOnce(spark,
      RunningStats(Sources.eventsStream(spark, sfDir),
        col("event_type"), col("value")), "stream_bench")
    // fidelity path needs the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (frows, _, favgBatch, felapsed) = runOnce(spark,
      StatefulStats(Sources.eventsStream(spark, sfDir),
        col("event_type"), col("value")).toDF(), "stream_bench_fidelity")
    println(s"""{"metric":"stream_rows_per_sec","value":${rows / elapsed},""" +
      s""""unit":"rows/sec","rows":$rows,"epochs":$epochs,""" +
      s""""avg_epoch_ms":$avgBatch,"wall_sec":$elapsed,""" +
      s""""fidelity_rows_per_sec":${frows / felapsed},""" +
      s""""fidelity_avg_epoch_ms":$favgBatch,"sf":"$sfDir"}""")
    spark.stop()
  }
}
