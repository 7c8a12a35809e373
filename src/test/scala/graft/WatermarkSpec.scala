package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{RunningStats, Watermarks}

/** Watermark semantics (SURVEY.md §2.7 "Watermarks / late data") and the
  * RocksDB state store (SURVEY.md §7.5.2, the 100 TB state mitigation).
  */
class WatermarkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("watermarked tumbling window emits once closed and drops late data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = Watermarks.windowedAgg(
      input.toDF().toDF("ts", "value"), "ts", col("value"),
      windowLength = "10 minutes", delay = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_windows")
      .outputMode("append").start()
    try {
      // window [10:00,10:10) gets 2 events; 10:12 is in the next window
      input.addData((ts("10:00"), 1.0), (ts("10:05"), 2.0), (ts("10:12"), 4.0))
      q.processAllAvailable()
      // 10:25 advances the watermark to 10:15 > 10:10 → first window closes
      input.addData((ts("10:25"), 8.0))
      q.processAllAvailable()
      val closed = spark.table("wm_windows").collect()
      assert(closed.length == 1, s"exactly the closed window: ${closed.toSeq}")
      assert(closed(0).getAs[Timestamp]("w_start") == ts("10:00"))
      assert(closed(0).getAs[Long]("n") == 2 &&
        closed(0).getAs[Double]("sum_value") == 3.0)

      // a late event for the closed window (10:03 < watermark 10:15) is
      // DROPPED: no new row, no revision of the emitted one
      input.addData((ts("10:03"), 100.0))
      q.processAllAvailable()
      val after = spark.table("wm_windows").collect()
      assert(after.length == 1 && after(0).getAs[Double]("sum_value") == 3.0,
        s"late event must not revise a closed window: ${after.toSeq}")
    } finally q.stop()
  }

  test("watermarked session window closes after gap + delay and evicts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Watermarks.sessionAgg(
      input.toDF().toDF("ts", "user", "value"), "ts", col("user"), col("value"),
      gap = "5 minutes", delay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_sessions")
      .outputMode("append").start()
    try {
      // one session: 10:00 and 10:02 merge (< 5 min apart); ends 10:07
      input.addData((ts("10:00"), "u", 1.0), (ts("10:02"), "u", 2.0))
      q.processAllAvailable()
      // 10:30 pushes the watermark to 10:25 > 10:07 → session closes
      input.addData((ts("10:30"), "u", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wm_sessions").collect()
      assert(rows.length == 1, s"one closed session: ${rows.toSeq}")
      assert(rows(0).getAs[Timestamp]("s_start") == ts("10:00"))
      assert(rows(0).getAs[Timestamp]("s_end") == ts("10:07"))
      assert(rows(0).getAs[Long]("n") == 2 &&
        rows(0).getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("stream-stream interval join: matches in-bound pairs, drops late rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val buys = MemoryStream[(Long, Timestamp, Long)]
    val joined = graft.streaming.StreamJoin.intervalJoin(
        clicks.toDF().toDF("event_id", "ts", "user_id"),
        buys.toDF().toDF("event_id", "ts", "user_id"),
        "user_id", "ts", delay = "5 minutes", boundSeconds = 600)
      .select(col("l_event_id").as("a"), col("r_event_id").as("b"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    def pairs(): Set[(Long, Long)] = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // purchase 5 min after the click, same user → exactly one pair
      clicks.addData((1L, ts("10:00"), 7L))
      buys.addData((100L, ts("10:05"), 7L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 100L)))
      // outside the 10-min bound, and a different user: no new pairs
      buys.addData((101L, ts("10:20"), 7L), (102L, ts("10:21"), 8L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 100L)))
      // advance the watermark on BOTH streams to ~11:55 — click #1's
      // buffered state (needed only until wm > 10:10) is evicted, and a
      // late in-bound purchase (10:06 << watermark) is dropped outright
      clicks.addData((2L, ts("12:00"), 9L))
      buys.addData((103L, ts("12:00"), 10L))
      q.processAllAvailable()
      buys.addData((104L, ts("10:06"), 7L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 100L)),
        s"late purchase must not join an evicted click: ${pairs()}")
    } finally q.stop()
  }

  test("cumulative stats run on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocksdb_").toString
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Double)]
      val stats = RunningStats(input.toDF().toDF("readTag_id", "value"),
        col("readTag_id"), col("value"))
      val q = stats.writeStream.format("memory").queryName("rocksdb_stats")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        input.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
        q.processAllAvailable()
        input.addData(("a", 5.0))
        q.processAllAvailable()
        val a = spark.table("rocksdb_stats").collect()
          .filter(_.getString(0) == "a").maxBy(_.getAs[Long]("counter"))
        assert(a.getAs[Double]("summer") == 9.0 && a.getAs[Long]("counter") == 3)
        assert(a.getAs[Double]("var") == 4.0)
        // the state store actually used RocksDB (files on disk)
        val stateDir = new java.io.File(s"$ckpt/state")
        assert(stateDir.exists, "state checkpoint directory written")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
