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

  // -- prefixSumByRange (the q91/q99/t80 cumulative-measure sibling) ---

  test("grouped running totals ≡ the window cumulative reference, two measures at once") {
    val df = frame(5000).withColumn("w", col("id") % 13)
    val got = Relational.prefixSumByRange(df, Seq("g"),
        Seq(col("v").asc, col("id").asc),
        Seq("cv" -> col("v"), "cw" -> col("w")), parts = 16)
      .select("g", "id", "cv", "cw").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cv", sum(col("v")).over(w))
      .withColumn("cw", sum(col("w")).over(w))
      .select("g", "id", "cv", "cw").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == ref)
  }

  test("global running total (t80's shape) ≡ the single-partition reference") {
    val df = frame(3000)
    val got = Relational.prefixSumByRange(df, Nil, Seq(col("id").asc),
        Seq("cum" -> col("v")), parts = 16)
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df.withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    // the final cumulative equals the exact global sum — the scalar
    // t80's checkpoint arithmetic depends on
    val t = df.agg(sum(col("v"))).head().getLong(0)
    assert(got.values.max == t)
  }

  test("prefix sums engage multiple slices and zero-value runs stay exact") {
    // values mostly zero with a few spikes: slice offsets of 0 must
    // coalesce correctly (the lit(0L) branch) and ties straddle slices
    val s = spark; import s.implicits._
    val df = (1 to 2000).map { i =>
      ("g", if (i % 97 == 0) i.toLong else 0L, i.toLong)
    }.toDF("g", "v", "id")
    val got = Relational.prefixSumByRange(df, Seq("g"), Seq(col("id").asc),
        Seq("cum" -> col("v")), parts = 8)
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    for ((id, cum) <- got) {
      if (id % 97 == 0) acc += id
      assert(cum == acc, s"id $id: $cum != $acc")
    }
  }
}
