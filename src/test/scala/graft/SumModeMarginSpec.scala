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
}
