package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatsOps

class StatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  private def byKey(dfName: String, df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("readTag_id") -> r).toMap

  // q20b/q20c outputs are rounded for the hash-grade oracle compare (see
  // StatsOps); comparisons against the unrounded decimal-exact path use
  // each column's rounding unit as the tolerance floor
  private val roundTol = Map(
    "summer" -> 1e-4, "sumsqr" -> 1e-2, "mean" -> 1e-6,
    "m2" -> 1e-2, "var" -> 1e-4, "variance" -> 1e-4,
    "bestmin" -> 1e-9, "bestmax" -> 1e-9)

  test("Welford (var_samp) engine operator matches decimal-exact oracle stats") {
    val oracle = byKey("q20", StatsOps.q20KeyedStats(spark, dir))
    val welford = byKey("q20b", StatsOps.q20bWelfordStats(spark, dir))
    assert(oracle.keySet == welford.keySet)
    for ((k, o) <- oracle) {
      val w = welford(k)
      assert(w.getAs[Long]("counter") == o.getAs[Long]("counter"))
      for (c <- Seq("summer", "sumsqr", "bestmin", "bestmax", "mean", "m2", "var")) {
        val ov = o.getAs[Double](c); val wv = w.getAs[Double](c)
        val tol = math.max(roundTol(c), math.abs(ov) * 1e-9)
        assert(math.abs(ov - wv) <= tol, s"$k.$c: welford=$wv oracle=$ov")
      }
    }
  }

  test("typed WelfordAggregator (fidelity) matches the declarative operator") {
    val decl = byKey("q20b", StatsOps.q20bWelfordStats(spark, dir))
    val fid = byKey("q20c", StatsOps.q20cFidelityStats(spark, dir))
    assert(decl.keySet == fid.keySet)
    for ((k, d) <- decl) {
      val f = fid(k)
      assert(f.getAs[Double]("counter").toLong == d.getAs[Long]("counter"))
      for ((fc, dc) <- Seq("summer" -> "summer", "sumsqr" -> "sumsqr",
          "bestmin" -> "bestmin", "bestmax" -> "bestmax", "mean" -> "mean",
          "m2" -> "m2", "variance" -> "var")) {
        val dv = d.getAs[Double](dc); val fv = f.getAs[Double](fc)
        val tol = math.max(roundTol(fc), math.abs(dv) * 1e-9)
        assert(math.abs(dv - fv) <= tol, s"$k.$fc: fidelity=$fv declarative=$dv")
      }
    }
  }

  test("wordcount total equals token count and never counts empty tokens") {
    val wc = StatsOps.q21WordCount(spark, dir)
    assert(wc.filter(col("word") === "").count() == 0)
    val totalFromCounts = wc.agg(sum("n")).collect()(0).getLong(0)
    val tokens = graft.streaming.WordCount
      .tokenize(Tables.documents(spark, dir), col("text")).count()
    assert(totalFromCounts == tokens)
  }

  test("json extract recovers an integer k for every event") {
    val n = Tables.events(spark, dir).count()
    val extracted = StatsOps.q22JsonExtract(spark, dir)
    assert(extracted.filter(col("k").isNull).count() == 0)
    assert(extracted.agg(sum("n")).collect()(0).getLong(0) == n)
  }
}
