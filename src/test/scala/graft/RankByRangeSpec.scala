package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Direct contract of `Relational.rankByRange` (the q83/q94/t73 slice
  * machinery): ranks equal the single-partition `row_number` reference
  * on every shape that exercises the slice plumbing — grouped and
  * global rankings, descending order keys, heavy tie runs that force
  * range-partition boundaries INSIDE a run of equal values, groups
  * smaller than one slice and groups spanning many slices, and more
  * requested slices than rows.
  */
class RankByRangeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  /** Deterministic pseudo-random frame: 3 groups of very different
    * sizes, values on a tiny grid so tie runs straddle slices.
    */
  private def frame(n: Int) = {
    val s = spark; import s.implicits._
    (1 to n).map { i =>
      val g = if (i % 100 == 0) "tiny" else if (i % 3 == 0) "mid" else "big"
      (g, (i * 2654435761L) % 7, i.toLong) // value grid 0..6 → long tie runs
    }.toDF("g", "v", "id")
  }

  test("grouped ascending ranks ≡ the window row_number reference") {
    val df = frame(5000)
    val got = Relational.rankByRange(df, Seq("g"),
        Seq(col("v").asc, col("id").asc), "rnk", "n", parts = 16)
      .select("g", "id", "rnk", "n").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val ref = df.withColumn("rnk", row_number().over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("g", "id", "rnk", "n").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2).toLong, r.getLong(3)))).toMap
    assert(got == ref)
  }

  test("global descending ranks ≡ the window reference (q83's shape)") {
    val df = frame(3000)
    val got = Relational.rankByRange(df, Nil,
        Seq(col("v").desc, col("id").asc), "rnk", "n", parts = 16)
      .select("id", "rnk", "n").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ref = df.withColumn("rnk", row_number().over(
        Window.orderBy(col("v").desc, col("id").asc)))
      .select("id", "rnk").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, 3000L))).toMap
    assert(got == ref)
  }

  test("more slices than rows: every rank still exact") {
    val df = frame(7)
    val got = Relational.rankByRange(df, Seq("g"),
        Seq(col("v").asc, col("id").asc), "rnk", "n", parts = 32)
      .select("g", "id", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ref = df.withColumn("rnk", row_number().over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)))
      .select("g", "id", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    assert(got == ref)
  }
}
