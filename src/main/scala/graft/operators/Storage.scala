package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Storage-layout operators — the write-side half of the 100 TB story.
  * Both are spec-verified by plan shape (StorageSpec) rather than the
  * DuckDB oracle: their OUTPUT is a layout property (which files exist,
  * which exchanges disappear), not a row set.
  *
  *  - [[writePartitioned]] / partition pruning: a curated corpus written
  *    `partitionBy(lang)` lets every downstream per-language read skip
  *    the other partitions at the FILE LISTING level — the scan's
  *    `PartitionFilters` prune before any byte is read, the single
  *    biggest I/O lever on a 100 TB corpus with a selective predicate.
  *  - [[writeBucketed]] / co-located joins: writing both sides of a
  *    recurring join bucketed (and sorted) by the join key makes the
  *    join plan EXCHANGE-FREE — each task reads matching bucket files
  *    from both sides. One write-time shuffle is amortized over every
  *    subsequent join against the table; fact-to-fact joins that cannot
  *    broadcast (orders ⋈ lineitem at 100 TB) are exactly where this
  *    pays.
  */
object Storage {

  /** Write `df` as parquet partitioned by `partCol` under `path`. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Read back one partition — the plan must show the predicate in
    * `PartitionFilters` (directory pruning), not as a data filter.
    */
  def readPartition(spark: SparkSession, path: String, partCol: String,
                    value: String): DataFrame =
    spark.read.parquet(path).filter(col(partCol) === value)

  /** Write `df` bucketed+sorted by `keyCol` as an external table at
    * `path` (bucket metadata lives in the session catalog; files are
    * plain parquet with bucket-id suffixes).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keyCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** orders ⋈ lineitem through bucketed tables: revenue per order
    * priority. With both sides bucketed by the join key into the same
    * bucket count, the sort-merge join plans WITHOUT a shuffle on
    * either side (StorageSpec pins the exchange-free plan).
    */
  def bucketedOrdersJoin(spark: SparkSession, dir: String, warehousePath: String,
                         buckets: Int = 8): DataFrame = {
    writeBucketed(Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_orderpriority")), "b_orders", s"$warehousePath/b_orders",
      "o_orderkey", buckets)
    writeBucketed(Tables.lineitem(spark, dir).select(col("l_orderkey"),
      col("l_extendedprice")), "b_lineitem", s"$warehousePath/b_lineitem",
      "l_orderkey", buckets)
    spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(30, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }
}
