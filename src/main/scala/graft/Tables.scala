package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided TPC-H-ish tables (`TESTDATA.md`).
  *
  * All engine operators take a scale-factor directory and read parquet
  * through here, so filter pushdown / column pruning reach the scan and a
  * future move to a partitioned table layout (or a catalog) is a one-file
  * change. At cluster scale these would be bucketed/partitioned tables; on
  * the flat test parquet we rely on Catalyst pushdown + AQE.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet has stored `ts` two ways across testdata generations:
    * INT64 TIMESTAMP(NANOS) (which Spark's parquet reader rejects unless
    * read as long) and plain TIMESTAMP(MICROS). Branch on the RESOLVED
    * type so both load to the same microsecond TimestampType:
    *  - nanos-as-long → convert with INTEGER division (`div`): Spark's
    *    `/` on longs casts through double, and ~1.7e18 ns exceeds 2^53,
    *    so `floor(long / 1000)` silently loses low bits (~12.5% of values
    *    land 1 µs off DuckDB's exact ns→µs truncation);
    *  - micros (arrives as TIMESTAMP_NTZ) → cast to TimestampType, a
    *    wall-clock no-op under the engine's fixed UTC session zone.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("CAST(ts AS BIGINT) div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
