package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Pins the streaming ingest-dedup contract (StreamDedup): first-arrival
  * keeper, duplicate suppression within the watermark horizon, and state
  * EVICTION after it — the re-admit behavior is what makes the state
  * bounded, so it is asserted, not just tolerated.
  */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("unbounded exact dedup keeps the first arrival across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamDedup.exactUnbounded(
      input.toDF().toDF("doc_id", "text"), col("text"))
    val q = out.writeStream.format("memory").queryName("sd_unbounded")
      .outputMode("append").start()
    try {
      input.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      q.processAllAvailable()
      val b1 = spark.table("sd_unbounded").collect()
      assert(b1.map(_.getString(1)).sorted.toSeq == Seq("alpha", "beta"))

      input.addData((4L, "alpha"), (5L, "gamma")) // alpha still held
      q.processAllAvailable()
      val all = spark.table("sd_unbounded").collect()
      assert(all.length == 3)
      assert(all.map(_.getString(1)).sorted.toSeq == Seq("alpha", "beta", "gamma"))
      // the alpha that survived is the first arrival, not id 4
      assert(all.find(_.getString(1) == "alpha").get.getLong(0) != 4L)
    } finally q.stop()
  }

  test("watermarked dedup drops dups inside the horizon and re-admits after eviction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamDedup.exactWithinWatermark(
      input.toDF().toDF("ts", "doc_id", "text"), col("text"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd_watermarked")
      .outputMode("append").start()
    try {
      // b1: same-batch duplicate collapsed
      input.addData((ts("10:00"), 1L, "dup"), (ts("10:00"), 2L, "dup"),
        (ts("10:01"), 3L, "other"))
      q.processAllAvailable()
      assert(spark.table("sd_watermarked").count() == 2)

      // b2: duplicate within the 10-minute horizon → dropped
      input.addData((ts("10:05"), 4L, "dup"))
      q.processAllAvailable()
      assert(spark.table("sd_watermarked").count() == 2)

      // b3: late-clock record advances the watermark to 10:50, which is
      // past "dup"'s 10:00 + 10 min → its state is evicted
      input.addData((ts("11:00"), 5L, "advance"))
      q.processAllAvailable()
      assert(spark.table("sd_watermarked").count() == 3)

      // b4: the same content re-admits after eviction (bounded state —
      // the long tail belongs to the periodic batch d40 sweep)
      input.addData((ts("10:59"), 6L, "dup"))
      q.processAllAvailable()
      val rows = spark.table("sd_watermarked").collect()
      assert(rows.length == 4)
      assert(rows.count(_.getString(2) == "dup") == 2)
      assert(rows.exists(r => r.getString(2) == "dup" && r.getLong(1) == 6L))
    } finally q.stop()
  }
}
