package graft

import org.apache.spark.sql.functions._

import graft.streaming.{RunningStats, Sources}

/** Streaming-pipeline benchmark (BASELINE.md streaming metrics): replays
  * the events table as a file stream through the cumulative stats
  * pipeline (the reference's job 1 shape) and reports rows/s plus
  * per-epoch latency from the query progress log. Prints one JSON line,
  * same convention as [[Bench]].
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val totals = new Totals
    spark.streams.addListener(totals)
    val stream = Sources.eventsStream(spark, sfDir)
    val stats = RunningStats(stream, col("event_type"), col("value"))
    val t0 = System.nanoTime()
    val q = stats.writeStream.format("memory").queryName("stream_bench")
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
    val (rows, epochs) = totals.synchronized((totals.rows, totals.epochs))
    val avgBatch = if (epochs > 0) totals.batchMsSum / epochs else 0.0
    q.stop()
    println(s"""{"metric":"stream_rows_per_sec","value":${rows / elapsed},""" +
      s""""unit":"rows/sec","rows":$rows,"epochs":$epochs,""" +
      s""""avg_epoch_ms":$avgBatch,"wall_sec":$elapsed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
