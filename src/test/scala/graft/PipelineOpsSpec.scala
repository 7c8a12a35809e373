package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Sampling, TextOps}

/** Semantics of the round-4 pipeline operators: as-of join (q38),
  * stratified sampling (d46), funnel (q39), TF-IDF (t54).
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $s:00")

  test("asOf picks the latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("10:00"), 100L), // two earlier rights → latest (12) wins
      (1L, ts("09:00"), 101L), // exactly-equal ts → inclusive match (11)
      (1L, ts("08:00"), 102L), // before any right → null → sentinel
      (2L, ts("10:00"), 103L)  // other key: only its own rights visible
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("08:30"), 11L),
      (1L, ts("09:00"), 11L),
      (1L, ts("09:30"), 12L),
      (2L, ts("09:59"), 21L)
    ).toDF("k", "ts", "rid")
    val got = AsOfJoin.asOf(left, right, "k", "ts")
      .select(col("lid"), coalesce(col("rid"), lit(-1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 12L, 101L -> 11L, 102L -> -1L, 103L -> 21L))
  }

  test("q38 plan contains no range-join blow-up: one shuffle window scan") {
    val plan = AsOfJoin.q38AsOfJoin(spark, dir).queryExecution.executedPlan.toString
    // the union+window formulation must not plan a join at all
    assert(!plan.contains("Join"), s"as-of must not materialize candidate pairs:\n$plan")
    assert(plan.contains("Window"))
  }

  test("d46 returns exactly K rows per stratum, a deterministic subset of docs") {
    val s1 = Sampling.d46StratifiedSample(spark, dir).collect()
    val s2 = Sampling.d46StratifiedSample(spark, dir).collect()
    assert(s1.toSeq == s2.toSeq, "sample must be a pure function of the data")
    val perLang = s1.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perLang.nonEmpty && perLang.values.forall(_ == 50),
      s"every stratum must fill its quota: $perLang")
    val docIds = Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(2)).forall(docIds.contains))
  }

  test("q39 funnel stages are monotonically non-increasing") {
    val rows = graft.operators.EventWindows.q39Funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 3)
    assert(rows("1_signup") >= rows("2_click_after_signup"))
    assert(rows("2_click_after_signup") >= rows("3_purchase_after_click"))
    assert(rows("1_signup") > 0)
  }

  test("t54 emits 3 ranked terms per doc with scores consistent with tf*idf") {
    val rows = TextOps.t54TfIdf(spark, dir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length == 3))
    byDoc.values.foreach { terms =>
      val scores = terms.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"rank order must follow score: ${terms.mkString(",")}")
    }
    assert(rows.forall(_.getDouble(4) > 0))
  }
}
