package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextOps}

/** Plan-level pins for the scale claims the round-6 operators' doc
  * comments make. These are the properties a 100 TB run depends on and a
  * refactor could silently lose while every value-level gate stays
  * green — so they are asserted against the optimized/physical plan,
  * the same discipline as StorageSpec's pruning/bucketing pins.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("t57 prefix sum windows by source — never a single-task global sort") {
    val plan = optimized(TextOps.t57SequencePack(spark, dir))
    assert(plan.contains("windowspecdefinition(source"),
      s"packing window must partition by source:\n$plan")
  }

  test("d47 election shuffles the md5 hash, not the chunk text") {
    val plan = optimized(Dedup.d47ChunkDedup(spark, dir))
    // the window key is the hash column; the chunk string never becomes
    // a shuffle key
    assert(plan.contains("windowspecdefinition(h#"),
      s"chunk election must partition by the md5 column:\n$plan")
  }

  test("d49 probes the benchmark set via broadcast — no corpus-vs-benchmark shuffle join") {
    val plan = physical(Dedup.d49Decontaminate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark window set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle against the benchmark:\n$plan")
  }

  test("q49 PQ joins are broadcast-only (codebook and distance tables)") {
    val plan = physical(Similarity.q49AnnPq(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"codebook/dtab must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"PQ scoring must not shuffle the corpus against the tables:\n$plan")
  }
}
