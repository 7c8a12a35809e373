package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.operators.EventWindows

/** Planted degenerate-group inputs for the zero-variance guards
  * (ADVICE r07): the driver corpora never produce a constant-x group, so
  * without these plants the q56/q57/q75/q80 guards would be dead code the
  * oracle gate cannot distinguish from the unguarded NaN/Inf divisions.
  * Each test runs the REAL query builder against a tiny planted table
  * directory: degenerate groups must come back NULL (not NaN/Inf), and a
  * planted perfect-fit group must still compute through the same path.
  */
class DegenerateGroupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  /** Table dir with: brand A = constant quantity (zero x-variance),
    * brand B = exact line y=10x (in cents space); events = one click and
    * one purchase per day for 6 days, all value 1.0 at midnight — every
    * daily series and the hour feature are constant, the day-of-week
    * feature varies.
    */
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-degenerate").toString
    val s = spark; import s.implicits._
    Seq((1L, "BRAND#A"), (2L, "BRAND#B")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    Seq(
      (1L, 5.0, 1.0), (1L, 5.0, 2.0), (1L, 5.0, 3.0),
      (2L, 1.0, 10.0), (2L, 2.0, 20.0), (2L, 3.0, 30.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val dayNs = 86400000000000L // ts column carries raw int64 nanos
    (0 to 5).flatMap(day => Seq(
        (day * dayNs, "click", 1.0), (day * dayNs, "purchase", 1.0)))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("q56 OLS: constant-x group fits NULL, exact-line group fits slope=10/r2=1") {
    val rows = Relational.q56Regression(spark, dir).collect()
    assert(rows.length == 2)
    val a = rows.find(_.getString(0) == "BRAND#A").get
    for (c <- Seq("slope", "intercept", "r2"))
      assert(a.isNullAt(a.fieldIndex(c)), s"degenerate group must fit $c as NULL")
    val b = rows.find(_.getString(0) == "BRAND#B").get
    assert(b.getAs[Double]("slope") == 10.0 && b.getAs[Double]("r2") == 1.0)
    assert(b.getAs[Double]("intercept") == 0.0)
  }

  test("q57 correlation matrix: constant value and hour features correlate as NULL") {
    val rows = Relational.q57CorrMatrix(spark, dir).collect()
    assert(rows.length == 2) // click + purchase, both with constant v and h
    for (r <- rows; c <- Seq("corr_value_hour", "corr_value_dow", "corr_hour_dow"))
      assert(r.isNullAt(r.fieldIndex(c)),
        s"${r.getString(0)}.$c must be NULL when either feature is constant")
  }

  test("q75 ACF: a constant daily series has NULL autocorrelation at every lag") {
    val rows = EventWindows.q75Autocorr(spark, dir).collect()
    assert(rows.length == 6) // 2 types x lags 1..3 — pairs exist, acf does not
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("acf"))))
  }

  test("q80 cross-correlation: constant click/purchase series read NULL, not NaN") {
    val rows = EventWindows.q80CrossCorr(spark, dir).collect()
    assert(rows.length == 4) // lags 0..3 all have aligned pairs
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("xcorr"))))
  }
}
