package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Batch relational inventory (SURVEY.md §2.7).
  *
  * The reference (mbero/spark_streaming_stream_analyzer) implements none of
  * these categories — verified exhaustively in SURVEY.md §2.7 over all 475
  * lines — so each is built directly on Catalyst's declarative operators and
  * inherits pushdown/pruning/codegen/AQE for free.
  *
  * Oracle-comparison discipline (driver hashes values after sorting columns
  * by name): every query carries an explicit ORDER BY, aliases every
  * computed column, and makes floating-point aggregates deterministic by
  * summing in exact decimal (cast before the sum) and casting the final
  * value back to double — both Spark and DuckDB then produce bit-identical
  * doubles regardless of partition order.
  */
object Relational {

  /** Exact-sum helper: sum a double column in decimal space, return double.
    * Deterministic under Spark's nondeterministic partition order (decimal
    * addition is associative), and matches DuckDB's sequential sum exactly.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** q1: pricing summary report (TPC-H Q1 shape).
    * Single scan + partial/final hash aggregate; only the 8 referenced
    * columns are read (ReadSchema pruning) and the shipdate filter is
    * pushed to parquet.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
