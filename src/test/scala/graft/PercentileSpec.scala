package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Pins the scale-safe rank-based exact-quantile plan (q19) to the
  * buffered `percentile`-aggregate form it replaced: same interpolation
  * at rank p·(n-1), computed without any whole-group value buffer.
  */
class PercentileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("rank-based q19 equals the buffered percentile aggregate on sf0.001") {
    val a = Relational.q19Percentiles(spark, dir).collect()
    val b = Relational.q19PercentilesBuffered(spark, dir).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[String]("l_returnflag") == y.getAs[String]("l_returnflag"))
      assert(x.getAs[Long]("n") == y.getAs[Long]("n"))
      Seq("median_price", "p95_price", "q1_qty").foreach { c =>
        assert(math.abs(x.getAs[Double](c) - y.getAs[Double](c)) < 1e-9,
          s"$c: ${x.getAs[Double](c)} vs ${y.getAs[Double](c)}")
      }
    }
  }

  test("rankQuantiles handles single-row groups, integral positions, ties") {
    import spark.implicits._
    // g=a: 1 row (all quantiles = the value). g=b: 5 rows 10..50 —
    // p=0.5 lands exactly on rank 3 (pos integral, frac 0), p=0.25 at
    // pos 1.0 → 20.0. g=c: all-tied values → every quantile = the tie.
    val df = (Seq(("a", 7.0)) ++
      Seq(10.0, 20.0, 30.0, 40.0, 50.0).map(("b", _)) ++
      Seq.fill(4)(("c", 3.0))).toDF("g", "v")
    val out = Relational.rankQuantiles(df, "g", "v",
      Seq("q25" -> 0.25, "q50" -> 0.5, "q100" -> 1.0), parts = 3)
      .orderBy("g").collect()
    assert(out.map(_.getAs[String]("g")).toSeq == Seq("a", "b", "c"))
    val a = out(0); val b = out(1); val c = out(2)
    assert(a.getAs[Double]("q25") == 7.0 && a.getAs[Double]("q50") == 7.0 &&
      a.getAs[Double]("q100") == 7.0)
    assert(b.getAs[Double]("q25") == 20.0 && b.getAs[Double]("q50") == 30.0 &&
      b.getAs[Double]("q100") == 50.0)
    assert(c.getAs[Double]("q25") == 3.0 && c.getAs[Double]("q100") == 3.0)
  }

  test("q19 plan contains no percentile buffer aggregate") {
    val plan = Relational.q19Percentiles(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      "declared q19 must not use the whole-group percentile buffer")
  }
}
