package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-bucket guard for LSH band/bucket self-joins (d42, d43, q32).
  *
  * A band-bucket equi-join is sub-quadratic only while bucket membership
  * stays bounded: one degenerate bucket with m members (boilerplate
  * documents sharing a band, a crawl of near-identical pages) contributes
  * m²/2 candidate pairs and quietly re-introduces the all-pairs blowup
  * *within that bucket* — at 100 TB a single hot bucket can dominate the
  * whole join. The guard drops every member of a bucket whose membership
  * exceeds `cap` BEFORE the self-join, bounding per-bucket work at cap²/2.
  *
  * Dropping (rather than salting) is the right semantics for near-dup
  * candidate generation: members of a degenerate bucket still meet in
  * their other bands/tables unless they are pathologically identical — and
  * exact-identical documents should be collapsed by exact dedup (d40)
  * upstream, as [[Curation]] does.
  *
  * Caps are chosen ≥4× the maximum occupancy observed on the test corpora
  * (doc band buckets ≤2-member groups; q32 buckets ≤134 at sf0.1), so on
  * non-degenerate data the guard is a no-op and the DuckDB oracle — which
  * has no guard — still hash-matches. Production jobs should monitor
  * [[hotBuckets]] and alert when it is non-empty.
  *
  * Plan shape: one extra aggregation over the band rows (same shuffle key
  * as the join, so AQE reuses the upstream exchange) plus a broadcast
  * anti-join against the (almost always empty) hot-bucket list — no
  * per-row state, no sort.
  */
object BucketGuard {

  /** (keys..., members) for every bucket over `cap` — the audit/alert
    * surface.
    */
  def hotBuckets(bands: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    bands.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("members"))
      .filter(col("members") > cap)

  /** `bands` minus every member of a bucket with more than `cap` members. */
  def capHotBuckets(bands: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val hot = hotBuckets(bands, keys, cap).select(keys.map(col): _*)
    bands.join(broadcast(hot), keys, "left_anti")
  }
}
