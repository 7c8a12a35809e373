package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Sum-mode equivalence gate (round-4 redesign of the margin check).
  *
  * Round 3's double-sum + ROUND(…,2) model relied on a 0.005 margin
  * dominating cross-engine double error. The first version of this spec
  * measured each total's distance to its nearest cents boundary and
  * found q1's A/O sum_disc_price sitting EXACTLY on one — grid-valued
  * data (2 dp inputs, 4-6 dp products) makes boundary hits structural,
  * so the margin model was unsound (q18's profit flipped a cent between
  * engines at sf0.1). `Relational.dsum` now computes the exact
  * fixed-point sum in integer micro-units (long fast path) or decimal
  * (audit path) — one semantic, so the two modes must agree
  * BIT-FOR-BIT, which is what this spec pins, on the heaviest money
  * query (q1) and a raw-value-column query (q12), at the bench scale
  * factor.
  */
class SumModeMarginSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val dir = "/root/testdata/sf0.1"

  private def both(q: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val fast = q(spark, dir).collect().map(_.toSeq).toSeq
    sys.props("graft.sums") = "decimal"
    val audit = try q(spark, dir).collect().map(_.toSeq).toSeq
    finally { sys.props.remove("graft.sums"); () }
    (fast, audit)
  }

  test("q1 totals are bit-identical between long and decimal sum modes") {
    val (fast, audit) = both(Relational.q1PricingSummary)
    assert(fast.nonEmpty && fast == audit,
      s"long/decimal sum modes diverged on q1:\n$fast\nvs\n$audit")
  }

  test("q12 value sums are bit-identical between long and decimal sum modes") {
    val (fast, audit) = both(Relational.q12HourlyEvents)
    assert(fast.nonEmpty && fast == audit,
      "long/decimal sum modes diverged on q12")
  }

  /** q20b/q20c still rely on a rounding margin for the FP-native columns
    * (ROUND(sumsqr,2)/ROUND(m2,2)/ROUND(summer,4)): both engines round
    * identically iff the exact total's distance to its nearest rounding
    * boundary dominates each engine's double-summation error — and the
    * error grows with the total while the boundary grid is fixed, so the
    * headroom is per-scale-factor, not universal (ADVICE r04). This
    * measures both quantities at each gated SF and asserts the
    * error-to-boundary headroom.
    *
    * Measured floor (2026-08-12): sf0.1 key "error" sumsqr sits 1.0e-4
    * from a .005 boundary with a 6.6e-7 vs-exact summation error — only
    * 152× headroom, NOT the "≥4 orders of magnitude" the round-3 margin
    * story claimed. Cross-engine delta ≤ 2× the vs-exact error, so the
    * bar here is 50× (true cross-engine headroom ≥25×). The vs-exact
    * error scales ~O(n·magnitude): at sf1+ expect ~10× less headroom —
    * when this assert fails, move the failing column to the q20
    * decimal-exact recipe (or gate q20b/q20c behind GRAFT_SUMS=decimal)
    * rather than loosening the bar.
    */
  test("q20b/q20c rounding margins dominate measured double-sum error at both gated SFs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def boundaryDist(x: Double, scale: Int): Double = {
      val u = math.pow(10, scale)
      val f = x * u - math.floor(x * u)
      math.abs(f - 0.5) / u
    }
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = Tables.events(spark, d)
        .select(col("event_type").as("k"), col("value").as("v"),
          (col("value") * col("value")).as("p"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).as("summer_native"),
          sum(col("v").cast(DecimalType(38, 20))).cast(DoubleType).as("summer_exact"),
          sum(col("p")).as("sumsqr_native"),
          sum(col("p").cast(DecimalType(38, 20))).cast(DoubleType).as("sumsqr_exact"),
          var_samp(col("v")).as("var_native"))
        .collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        val n = r.getAs[Long]("n").toDouble
        val checks = Seq(
          // (label, native, exact, round scale)
          ("summer", r.getAs[Double]("summer_native"), r.getAs[Double]("summer_exact"), 4),
          ("sumsqr", r.getAs[Double]("sumsqr_native"), r.getAs[Double]("sumsqr_exact"), 2),
          ("m2", r.getAs[Double]("var_native") * (n - 1),
            r.getAs[Double]("sumsqr_exact") -
              r.getAs[Double]("summer_exact") * r.getAs[Double]("summer_exact") / n, 2))
        for ((label, native, exact, scale) <- checks) {
          val err = math.max(math.abs(native - exact), 1e-15)
          val dist = boundaryDist(exact, scale)
          assert(dist / err >= 50,
            f"$d ${r.getString(0)} $label: boundary distance $dist%.3g only " +
              f"${dist / err}%.1fx the measured double error $err%.3g — margin unsound")
        }
      }
    }
  }
}
