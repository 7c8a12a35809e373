package graft

// Throwaway profiling harness (not part of the library surface).
object ProfileMain {
  // running totals across stages, reset per profiled query — executor
  // CPU is the contention-robust A/B metric on a co-tenanted box
  private val totRun = new java.util.concurrent.atomic.AtomicLong(0)
  private val totCpu = new java.util.concurrent.atomic.AtomicLong(0)
  private val totGc = new java.util.concurrent.atomic.AtomicLong(0)
  private val totStages = new java.util.concurrent.atomic.AtomicLong(0)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        val run = i.taskMetrics.executorRunTime / 1000.0
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        val deser = i.taskMetrics.executorDeserializeTime / 1000.0
        val gc = i.taskMetrics.jvmGCTime / 1000.0
        totRun.addAndGet(i.taskMetrics.executorRunTime)
        totCpu.addAndGet(i.taskMetrics.executorCpuTime / 1000000)
        totGc.addAndGet(i.taskMetrics.jvmGCTime)
        totStages.incrementAndGet()
        if (dur > 0.3)
          println(f"PROFSTAGE id=${i.stageId} tasks=${i.numTasks} dur=$dur%.2f run=$run%.2f cpu=$cpu%.2f gc=$gc%.2f deser=$deser%.2f rdds=${i.rddInfos.map(_.name).mkString("|").take(80)}")
      }
    })
    def resetTotals(): Unit = { totRun.set(0); totCpu.set(0); totGc.set(0); totStages.set(0) }
    def totals(): String =
      f"stages=${totStages.get} run=${totRun.get / 1000.0}%.2f cpu=${totCpu.get / 1000.0}%.2f gc=${totGc.get / 1000.0}%.2f"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("d41_ngram_jaccard")
    val defs = SparkEntry.allDefs.map(d => d.name -> d).toMap
    names.foreach { n =>
      if (n.startsWith("set:")) {
        val Array(k, v) = n.stripPrefix("set:").split("=", 2)
        spark.conf.set(k, v); println(s"PROF set $k=$v")
      } else if (n.startsWith("show:")) {
        defs(n.stripPrefix("show:")).fn(spark, dir).collect()
          .foreach(r => println("ROW " + r.mkString("|")))
      } else if (n.startsWith("noop:")) {
        // bench-faithful timing: the noop sink computes every column
        // (guide §1.4) — count() lets Catalyst prune
        val q = n.stripPrefix("noop:")
        resetTotals()
        val s = System.nanoTime
        defs(q).fn(spark, dir).write.format("noop").mode("overwrite").save()
        printf("PROFNOOP %s t=%.2f s %s%n", q, (System.nanoTime - s) / 1e9, totals())
        ModelCache.releaseTransient(spark)
      } else if (n.startsWith("explain:")) {
        println(defs(n.stripPrefix("explain:")).fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else {
      val s = System.nanoTime
      val rows = if (n == "scan1") {
        Tables.documents(spark, dir).count()
      } else if (n == "scan2") {
        import org.apache.spark.sql.functions._
        Tables.documents(spark, dir).filter(size(split(col("text"), " ")) >= 3).count()
      } else if (n == "scan3") {
        import org.apache.spark.sql.functions._
        Tables.documents(spark, dir).repartition(32)
          .filter(size(split(col("text"), " ")) >= 3).count()
      } else if (n == "scan4") {
        import org.apache.spark.sql.functions._
        Tables.documents(spark, dir).repartition(32).count()
      } else if (n == "sig_only") {
        graft.operators.Dedup.minhashSignatures(spark, dir).count()
      } else if (n == "d42_noguard") {
        graft.operators.Dedup.minhashNearDupPairsFrom(
          Tables.documents(spark, dir), maxBucket = Int.MaxValue).count()
      } else if (n == "d41_parts") {
        import org.apache.spark.sql.functions._
        val sh = graft.operators.Dedup.minhashSignatures(spark, dir) // warm nothing
        val docs = Tables.documents(spark, dir)
          .repartition(32).filter(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id"), explode(array_distinct(transform(
            sequence(lit(1), size(split(col("text"), " ")) - 2),
            i => concat_ws(" ", element_at(split(col("text"), " "), i),
              element_at(split(col("text"), " "), i + 1),
              element_at(split(col("text"), " "), i + 2))))).as("shingle")).cache()
        val t1 = System.nanoTime
        val nSh = docs.count()
        println(f"PROF shingle_build rows=$nSh t=${(System.nanoTime - t1) / 1e9}%.2f s")
        val t2 = System.nanoTime
        val inter = docs.as("a").join(docs.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
        val nPairs = inter.count()
        println(f"PROF pair_join rows=$nPairs t=${(System.nanoTime - t2) / 1e9}%.2f s")
        nPairs
      } else defs(n).fn(spark, dir).count()
      printf("PROF %s rows=%d t=%.2f s%n", n, rows, (System.nanoTime - s) / 1e9)
      // mirror the harnesses' between-queries storage hygiene so solo
      // profile numbers are measured under battery semantics
      ModelCache.releaseTransient(spark)
      }
    }
    ModelCache.releaseAll(spark)
    spark.stop()
  }
}
