package graft

/** Benchmark main (driver contract): runs every declared query on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query wall
  * seconds. Uses the canonical [[GraftSession]] (AQE on, UTC, shuffle
  * partitions = cores) at local[32] unless `SPARK_GRAFT_CPUS` overrides.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // untimed warmup: pay the one-off JIT/codegen/parquet-reader init
    // outside the measured loop so the first query isn't penalized
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.documents(spark, sfDir).count()
    Tables.lineitem(spark, sfDir).count()
    // steady-state warmup (StreamBench's warm-fairness discipline applied
    // to the batch suite): replay the WHOLE query set unmeasured at a
    // tiny SF so each query's codegen/JIT/window-exec warm-up is paid
    // before its measured run. Without this, whichever queries sort
    // first (c7x/d4x) absorb the entire cold-JVM cost and read as 3-5×
    // regressions on unchanged code (BASELINE.md round-6 table).
    val warmDir = sys.env.getOrElse("GRAFT_BENCH_WARMUP_SF", "/root/testdata/sf0.001")
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir)))
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // a query that fails only at the warm-up SF reverts to being
          // measured cold — make that visible instead of silent
          System.err.println(s"[bench] warm-up MISSED for $name: ${e.getMessage}")
        }
      }
    // fixed name order: a Map's iteration order would vary with the query
    // set, making per-query numbers incomparable across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write: executes the DECLARED plan — count() would let
      // Catalyst drop the final sort and all projections, under-measuring
      // order-by and expression-heavy queries
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a failed query's time-to-failure must not pass as a measurement:
    // report it as -1 in the per-query map and list it under "failed"
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // stdout is interleaved with sbt [info] noise; the file copy gives the
    // driver a parse target that can't miss
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), line + "\n")
    spark.stop()
  }
}
