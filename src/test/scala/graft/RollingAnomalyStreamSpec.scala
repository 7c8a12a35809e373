package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AnomalyEvent, RollingAnomaly}

/** The streamed rolling fence must flag EXACTLY the rows batch q64 flags,
  * with frames carrying across micro-batch boundaries.
  */
class RollingAnomalyStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("streamed 4-epoch replay ≡ batch q64, frames straddling epochs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.Tables.events(spark, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("tus"),
          col("event_id"), floor(col("value") * 100.0 + 0.5).cast("long").as("vc"))
        .collect()
        .map(r => AnomalyEvent(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(e => (e.tus, e.event_id))
      // 4 time-ordered chunks — per-key monotone across epochs, so frames
      // must flow through the ring state at every boundary
      val chunks = events.grouped(math.max(1, (events.length + 3) / 4)).toSeq
      assert(chunks.length == 4)

      val input = MemoryStream[AnomalyEvent]
      val hits = RollingAnomaly(input.toDF())
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ranom").toString
      val q = hits.writeStream.format("memory").queryName("ranom_hits")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()

      val streamed = spark.table("ranom_hits").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val batch = graft.operators.EventWindows.q64RollingAnomaly(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
      // non-vacuous epoch carry: at least one flagged event must be among
      // the first 23 events OF ITS TYPE inside a non-first chunk — its
      // trailing frame then necessarily used rows from a previous epoch,
      // so the equality above really exercised cross-batch ring state.
      val earlyInLaterChunk = chunks.drop(1).flatMap { c =>
        c.groupBy(_.event_type).valuesIterator.flatMap(_.take(23))
      }.map(e => (e.event_type, e.event_id)).toSet
      val flagged = streamed.map { case (t, id, _, _) => (t, id) }
      assert(flagged.exists(earlyInLaterChunk.contains),
        "no flagged event had a frame straddling an epoch boundary — carry untested")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
