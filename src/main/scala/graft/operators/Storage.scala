package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

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

  /** 2-D Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — pure shift/mask/add expressions, so
    * the key is codegen'd and engine-portable. Disjoint bit positions
    * make `+` equivalent to bitwise OR.
    */
  def zorderKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int = 16): org.apache.spark.sql.Column =
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ + _)

  /** Write `df` Z-order-clustered on two integer key columns: normalize
    * each key to an equal-width 8-bit grid (raw-bit interleaving is
    * cardinality-skewed — a 16-bit key zipped with a 4-bit key degrades
    * to a linear sort on the wide one; production Z-order bucketizes
    * first, exactly as Delta/Iceberg OPTIMIZE ZORDER does), interleave,
    * then range-partition + sort by the Morton key. Every output file
    * covers a small RECTANGLE in (a, b) space, so parquet footer min/max
    * stats prune row groups for selective predicates on EITHER column —
    * a linear sort clusters only its leading column, leaving the
    * trailing column's per-file ranges corpus-wide. The grid bounds come
    * from a 1-row stats aggregate cross-joined in (broadcast, no driver
    * collect). StorageSpec pins the per-file range-width property
    * directly from the written files.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int = 16): Unit = {
    val stats = df.agg(
      min(col(colA).cast("long")).as("__amin"), max(col(colA).cast("long")).as("__amax"),
      min(col(colB).cast("long")).as("__bmin"), max(col(colB).cast("long")).as("__bmax"))
    // Grid cell in DECIMAL(38,0): the int64 form ((a - amin) * 256)
    // overflows once the key range exceeds ~2^55 (ADVICE r07); decimal
    // widening keeps the same floor-division values at every range.
    // Columns are referenced as Column objects, not interpolated SQL, so
    // non-identifier column names survive.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def grid(c: Column, mn: Column, mx: Column): Column =
      floor(((c.cast("long") - mn).cast(dec) * lit(256)) /
        ((mx - mn).cast(dec) + lit(1))).cast("long")
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zorderKey(
        grid(col(colA), col("__amin"), col("__amax")),
        grid(col(colB), col("__bmin"), col("__bmax")), bits = 8))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
      .write.mode("overwrite").parquet(path)
  }

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

  // -------------------------------------------------------------------
  // c86: ANALYZE-style column statistics — the optimizer-stats surface
  // (count, exact NDV, min/max, equi-height histogram bounds) a
  // catalog's ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS builds,
  // as one engine query: stack the profiled columns into a
  // (col_name, value) lane, one hash aggregate for the scalar stats,
  // and the q19 slice-rank machinery for EXACT interpolated quantiles —
  // never a per-column whole-table sort, never a value buffer; the
  // stacked lane costs one extra scan per profiled column and column
  // pruning keeps each scan to its own 8 bytes/row.
  // -------------------------------------------------------------------
  private val StatCols = Seq("l_extendedprice", "l_quantity")

  def c86ColumnStats(spark: SparkSession, dir: String): DataFrame = {
    val stacked = StatCols.map { c =>
      Tables.lineitem(spark, dir)
        .select(lit(c).as("col_name"), col(c).cast("double").as("v"))
    }.reduce(_ unionByName _)
    val scalar = stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n"),
      countDistinct(col("v")).as("ndv"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
    val quant = Relational.rankQuantiles(stacked, "col_name", "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95))
      .drop("__n")
    scalar.join(quant, "col_name")
      .select(col("col_name"), col("n"), col("ndv"), col("min_v"), col("max_v"),
        col("p25"), col("p50"), col("p75"), col("p95"))
      .orderBy(col("col_name"))
  }

  val c86ColumnStatsSql: String = {
    val lanes = StatCols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS v FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH stacked AS (
       |  $lanes)
       |SELECT col_name, COUNT(*) AS n, COUNT(DISTINCT v) AS ndv,
       |  MIN(v) AS min_v, MAX(v) AS max_v,
       |  ROUND(quantile_cont(v, 0.25), 6) AS p25,
       |  ROUND(quantile_cont(v, 0.5), 6) AS p50,
       |  ROUND(quantile_cont(v, 0.75), 6) AS p75,
       |  ROUND(quantile_cont(v, 0.95), 6) AS p95
       |FROM stacked
       |GROUP BY col_name
       |ORDER BY col_name""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("c86_column_stats", c86ColumnStats _, c86ColumnStatsSql),
  )
}
