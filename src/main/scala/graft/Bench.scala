package graft

/** Benchmark main (driver contract): runs every declared query on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query wall
  * seconds. Uses the canonical [[GraftSession]] (AQE on, UTC, shuffle
  * partitions = cores) at local[32] unless `SPARK_GRAFT_CPUS` overrides.
  */
object Bench {

  /** The round-1 driver-baseline inventory (BENCH_r01.json, 35 queries) —
    * the subset BASELINE.md's 2× acceptance bar is defined over. The
    * printed stdout line carries per-query seconds for THIS subset only:
    * the driver's log capture keeps a bounded tail (~2000 chars), and the
    * full-inventory map (~6 KB at 188 queries) no longer fits — rounds
    * 10-11 lost the parsed record to exactly that truncation. The full
    * map is always written to `bench.json` (stable path, committed).
    */
  private val BaselineSubset: Set[String] = Set(
    "q1_pricing_summary", "q2_revenue_by_nation", "q3_semi_join",
    "q4_anti_join", "q5_window_topn", "q6_running_window", "q7_topk",
    "q8_setops", "q9_rollup", "q10_cube", "q11_distinct",
    "q11b_approx_distinct", "q12_hourly_events", "q13_grouping_sets",
    "q14_correlated_subquery", "q15_range_join", "q20_keyed_stats",
    "q20b_welford_stats", "q20c_fidelity_stats", "q21_wordcount",
    "q22_json_extract", "q30_ann_brute", "q31_ann_lsh", "d40_dedup_exact",
    "d41_ngram_jaccard", "d42_minhash_lsh", "d43_simhash",
    "d44_embedding_neardup", "m60_media_catalog", "m61_decode_features",
    "m62_frame_sample", "t50_langid", "t51_quality", "t52_token_count",
    "t53_fingerprint")

  /** 1-minute load average, sampled so a bench artifact taken on a
    * contended machine is self-diagnosing (VERDICT r16 item 6: two
    * rounds of driver bench artifacts were corrupted by co-tenant load
    * and could only be reconciled after the fact).
    */
  private def loadavg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadBefore = loadavg()
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
        finally ModelCache.releaseTransient(spark)
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
      val dt = (System.nanoTime() - t0) / 1e9
      // storage hygiene between measured queries (outside the timed
      // region): drop every non-shielded checkpointed block — 67 eager
      // checkpoint sites × 233 queries otherwise accumulate pinned
      // block sets that degrade the battery tail (r12: t78 67 s
      // in-battery vs 5.5 s solo, same code)
      ModelCache.releaseTransient(spark)
      (name, dt, ok)
    }
    // a failed query's time-to-failure must not pass as a measurement:
    // report it as -1 in the per-query map and list it under "failed"
    def qmap(rs: Seq[(String, Double, Boolean)], dp: Int): String =
      rs.map { case (k, v, ok) =>
        s"\"" + k + "\":" + (if (ok) BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP) else -1.0)
      }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val loadAfter = loadavg()
    val loads = s""""loadavg_before":$loadBefore,"loadavg_after":$loadAfter"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":${qmap(results, 9)},"failed":$failed,$loads,"sf":"$sfDir"}"""
    // full per-query record → stable committed path; the driver artifact
    // must never depend on stdout-tail length (VERDICT r10 item 6)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), fullLine + "\n")
    // stdout line: summary + the BASELINE.md 35-query subset at 3 dp —
    // ~1.2 KB, inside the driver's ~2 KB tail capture, so BENCH_r{N}
    // parses again (r10/r11 printed the full map and lost the parse)
    val base = results.filter(r => BaselineSubset.contains(r._1))
    val baseTotal =
      BigDecimal(base.collect { case (_, v, true) => v }.sum)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"baseline_subset_total":$baseTotal,"queries":${qmap(base, 3)},"queries_full":"bench.json","failed":$failed,$loads,"sf":"$sfDir"}""")
    ModelCache.releaseAll(spark)
    spark.stop()
  }
}
