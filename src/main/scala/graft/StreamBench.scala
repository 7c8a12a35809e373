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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val stream = Sources.eventsStream(spark, sfDir)
    val stats = RunningStats(stream, col("event_type"), col("value"))
    val t0 = System.nanoTime()
    val q = stats.writeStream.format("memory").queryName("stream_bench")
      .outputMode("update").start()
    q.processAllAvailable()
    val elapsed = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress
    val rows = progress.map(_.numInputRows).sum
    val epochs = progress.count(_.numInputRows > 0)
    val batchMs = progress.filter(_.numInputRows > 0)
      .map(_.durationMs.getOrDefault("triggerExecution", 0L).toDouble)
    val avgBatch = if (batchMs.nonEmpty) batchMs.sum / batchMs.length else 0.0
    q.stop()
    println(s"""{"metric":"stream_rows_per_sec","value":${rows / elapsed},""" +
      s""""unit":"rows/sec","rows":$rows,"epochs":$epochs,""" +
      s""""avg_epoch_ms":$avgBatch,"wall_sec":$elapsed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
