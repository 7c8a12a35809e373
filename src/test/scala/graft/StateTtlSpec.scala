package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in state TTL on the imperative stats pipeline (SURVEY §2.7
  * Watermarks row: "optional state TTL as 100 TB hygiene").
  *
  * Default behavior (no TTL) is pinned by StreamingSpec's cross-batch
  * tests: state lives forever, faithful to the reference's acknowledged
  * unbounded-state risk (AVG:97-99). Here: a key idle past the TTL is
  * evicted and RE-INITIALIZES (counter restarts at the batch's own
  * count), while a generous TTL retains state across batches.
  *
  * Note: TTL switches the operator to TimeMode.ProcessingTime, under
  * which the engine plans a (possibly empty) micro-batch every trigger
  * to advance the expiry clock — `processAllAvailable` never observes a
  * quiescent stream and cannot be used; these tests poll the memory
  * sink for the expected emission count instead.
  */
class StateTtlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

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

  private def awaitRows(table: String, n: Int, timeoutMs: Long = 60000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (spark.table(table).count() < n) {
      assert(System.nanoTime() < deadline,
        s"timed out waiting for $n rows in $table (have ${spark.table(table).count()})")
      Thread.sleep(100)
    }
  }

  /** Runs two single-record batches for key "k" with `sleepMs` between
    * them and returns the max counter emitted (2.0 = state survived,
    * 1.0 = both batches started from zero).
    */
  private def maxCounterAfterTwoBatches(queryName: String, sleepMs: Long): Double = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(String, Double)]
      val stats = graft.fidelity.StatefulStats(
        input.toDF().toDF("readTag_id", "value"), col("readTag_id"), col("value"))
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ttl_$queryName").toString
      val q = stats.writeStream.format("memory").queryName(queryName)
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        input.addData(("k", 5.0)); awaitRows(queryName, 1)
        Thread.sleep(sleepMs)
        input.addData(("k", 7.0)); awaitRows(queryName, 2)
        spark.table(queryName).collect()
          .map(_.getAs[Double]("counter")).max
      } finally q.stop()
    }
  }

  test("key idle past spark.graft.stats.ttl is evicted and re-initializes") {
    spark.conf.set(graft.fidelity.StatefulStats.TtlConfKey, "300ms")
    try {
      val c = maxCounterAfterTwoBatches("ttl_evict", sleepMs = 3000)
      // State from batch 1 expired → batch 2 re-runs from agg.zero.
      assert(c == 1.0, s"expected re-initialized counter 1.0, got $c")
    } finally spark.conf.unset(graft.fidelity.StatefulStats.TtlConfKey)
  }

  test("key within a generous TTL retains state across batches") {
    spark.conf.set(graft.fidelity.StatefulStats.TtlConfKey, "1h")
    try {
      val c = maxCounterAfterTwoBatches("ttl_retain", sleepMs = 0)
      assert(c == 2.0, s"expected accumulated counter 2.0, got $c")
    } finally spark.conf.unset(graft.fidelity.StatefulStats.TtlConfKey)
  }

  test("default (no TTL) keeps TimeMode.None and accumulates forever") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(String, Double)]
      val stats = graft.fidelity.StatefulStats(
        input.toDF().toDF("readTag_id", "value"), col("readTag_id"), col("value"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ttl_none").toString
      val q = stats.writeStream.format("memory").queryName("ttl_none")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        // No TTL → TimeMode.None → processAllAvailable quiesces normally.
        input.addData(("k", 5.0)); q.processAllAvailable()
        Thread.sleep(1000)
        input.addData(("k", 7.0)); q.processAllAvailable()
        val c = spark.table("ttl_none").collect()
          .map(_.getAs[Double]("counter")).max
        assert(c == 2.0, s"expected accumulated counter 2.0, got $c")
      } finally q.stop()
    }
  }
}
