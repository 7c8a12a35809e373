package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.{NearDupClusterMaintainer, StreamNearDup}

/** Streaming determinism audit main (VERDICT r15 item 7): replays the
  * documents table through [[StreamNearDup]] + [[NearDupClusterMaintainer]]
  * in `nBatches` id-monotone micro-batches and dumps the final pair set
  * and cluster labels to parquet.
  *
  * `tools/stream_determinism.py` runs this under different
  * SPARK_GRAFT_CPUS (32 vs 8 — thread count AND shuffle-partition count,
  * via [[GraftSession]]) and different batchings (1 vs 3 triggers), then
  * exact-compares the dumps: the emitted pair SET and the cluster
  * labeling must be invariant to both partitioning and trigger
  * boundaries — the streaming analogue of tools/determinism_check.py's
  * 32-vs-8 Verify discipline.
  *
  * Usage: runMain graft.StreamAudit <sfDir> <outDir> <nBatches>
  */
object StreamAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, nBatchesStr) = args
    val nBatches = nBatchesStr.toInt
    val spark = GraftSession.get()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val cuts = (0 to nBatches).map(i => i * docs.length / nBatches)
    val maintainer = new NearDupClusterMaintainer(spark)
    val pairBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]

    val input = MemoryStream[(Long, String)]
    val pairs = StreamNearDup(input.toDF().toDF("doc_id", "text"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_saudit").toString
    val q = pairs.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.NearDupPair],
                       _: Long) =>
        val rows = batch.collect() // pair list: orders smaller than corpus
        pairBuf ++= rows.map(p => (p.doc_a, p.doc_b, p.est_jaccard))
        maintainer.fold(batch.toDF())
        ()
      }.start()
    try {
      (0 until nBatches).foreach { i =>
        input.addData(docs.slice(cuts(i), cuts(i + 1)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    pairBuf.toSeq.toDF("doc_a", "doc_b", "est_jaccard")
      .orderBy(col("doc_a"), col("doc_b")).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/pairs")
    maintainer.labels.orderBy(col("doc_id")).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/labels")
    println(s"[stream-audit] batches=$nBatches pairs=${pairBuf.size} " +
      s"labels=${maintainer.labels.count()}")
    spark.stop()
  }
}
