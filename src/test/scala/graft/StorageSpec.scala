package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Storage

/** Storage-layout plan shapes: partition pruning on partitioned writes,
  * exchange-free joins on bucketed tables.
  */
class StorageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("partitionBy write + selective read prunes at the partition level") {
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Storage.writePartitioned(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text")),
      path, "lang")
    // one directory per lang value on disk
    val langDirs = new java.io.File(path).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.nonEmpty, s"expected lang= partition dirs, got ${langDirs.toSeq}")
    val one = Storage.readPartition(spark, path, "lang", langDirs.head.stripPrefix("lang="))
    val plan = one.queryExecution.executedPlan.toString
    // the predicate must appear as a PartitionFilter (listing-level
    // pruning), NOT as a PushedFilter/data filter on row groups
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).takeWhile(_ != ']').contains("lang"),
      s"lang predicate must prune partitions:\n$plan")
    assert(one.count() > 0)
    // pruned read returns exactly the partition's rows
    val expected = Tables.documents(spark, dir)
      .filter(col("lang") === langDirs.head.stripPrefix("lang=")).count()
    assert(one.count() == expected)
  }

  test("bucketed tables join without any shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    // forbid broadcast so the join must be sort-merge — the point is the
    // missing ShuffleExchange, which broadcast would mask
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Storage.bucketedOrdersJoin(spark, dir, wh)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      // the join inputs come straight from bucketed scans: the ONLY
      // exchange allowed in the whole plan is the post-join aggregation's
      val joinPart = plan.split("SortMergeJoin", 2)(1)
      assert(!joinPart.contains("ShuffleExchange") && !joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      // and the result matches the plain (unbucketed) join
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
