package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** t75/t76 learned quality gate: scores and the one-batch gradient step
  * match a naive in-memory recomputation (same snap discipline), and the
  * step actually descends the logistic loss it differentiates.
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  // the public-weight contract, restated (the operator's constants are
  // operator-private on purpose — this spec pins their visible effect)
  private val feats = Seq("len_sat", "punct_ratio", "stop_ratio", "ttr", "mean_tok_len")
  private val wInfer = Map("len_sat" -> 2.0, "punct_ratio" -> -4.0,
    "stop_ratio" -> 3.0, "ttr" -> 1.5, "mean_tok_len" -> 0.2)
  private val w0 = Map("len_sat" -> 1.0, "punct_ratio" -> -1.0,
    "stop_ratio" -> 1.0, "ttr" -> 1.0, "mean_tok_len" -> 0.0)

  private def round6(v: Double): Double =
    new JBigDecimal(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** (doc_id, feature map) per doc — the operator's exact arithmetic. */
  private lazy val naiveFeatures: Seq[(Long, Map[String, Double])] = {
    val stop = TextOps.stopwords("en").toSet
    Tables.documents(spark, dir).select("doc_id", "text").collect().map { r =>
      val text = r.getString(1)
      val t = text.split(" ", -1)
      val nTok = t.length.toDouble
      val nChars = text.length.toDouble
      val nPunct = "[^a-z0-9 ]".r.findAllIn(text).size.toDouble
      r.getLong(0) -> Map(
        "len_sat" -> math.min(1.0, nTok / 100.0),
        "punct_ratio" -> nPunct / nChars,
        "stop_ratio" -> t.count(stop) / nTok,
        "ttr" -> t.distinct.length / nTok,
        "mean_tok_len" -> (nChars - (nTok - 1)) / nTok)
    }.toSeq
  }

  private def margin(ws: Map[String, Double], b: Double, x: Map[String, Double]) =
    feats.foldLeft(b)((acc, f) => acc + ws(f) * x(f))

  private def s9(z: Double): Long =
    math.floor(1.0 / (1.0 + math.exp(-z)) * 1e9 + 0.5).toLong

  test("t75 scores and keep flags match the naive recompute") {
    val got = TextOps.t75QualityClassifier(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("z"), r.getAs[Long]("score_n9"), r.getAs[Long]("keep")))).toMap
    assert(got.size == naiveFeatures.size && got.nonEmpty)
    for ((id, x) <- naiveFeatures) {
      val z = margin(wInfer, -2.9, x)
      assert(got(id) == ((z, s9(z), if (z >= 0) 1L else 0L)), s"doc $id")
    }
    val keeps = got.values.count(_._3 == 1L)
    assert(keeps > 0 && keeps < got.size, "the gate must actually separate docs")
  }

  test("t76 gradient step matches the naive exact-integer recompute and descends the loss") {
    val got = TextOps.t76QualityGradStep(spark, dir).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // labels from the t51 heuristic, exactly as the operator derives them
    val labeled = naiveFeatures.map { case (_, x) =>
      val q = round6(0.3 * x("len_sat") + 0.4 * (1.0 - x("punct_ratio")) +
        0.3 * math.min(1.0, x("stop_ratio") * 5.0))
      (x, if (q >= 0.5) 1L else 0L)
    }
    assert(labeled.map(_._2).distinct.size == 2, "both label classes present")
    val n = labeled.size
    val r9s = labeled.map { case (x, y) => (x, s9(margin(w0, 0.0, x)) - y * 1000000000L) }
    val gBias = round6(r9s.map(v => BigInt(v._2)).sum.toDouble / (1e9 * n))
    assert(got("bias") == ((0.0, gBias, round6(0.0 - 0.5 * gBias))))
    for (f <- feats) {
      val num = r9s.map { case (x, r9) =>
        BigInt(r9) * BigInt(math.floor(x(f) * 1e6 + 0.5).toLong)
      }.sum
      val g = round6(num.toDouble / (1e15 * n))
      assert(got(f) == ((w0(f), g, round6(w0(f) - 0.5 * g))), s"feature $f")
    }
    // the step must descend the full-batch logistic loss it differentiates
    def loss(ws: Map[String, Double], b: Double): Double =
      labeled.map { case (x, y) =>
        val z = margin(ws, b, x)
        math.log1p(math.exp(-z)) + (1 - y) * z // -y·ln σ − (1−y)·ln(1−σ)
      }.sum / n
    val w1 = feats.map(f => f -> got(f)._3).toMap
    assert(loss(w1, got("bias")._3) < loss(w0, 0.0),
      "one gradient step at eta=0.5 must reduce the loss")
  }

  test("t76 plans a single feature-width aggregate — no corpus-sized state") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val root = TextOps.t76QualityGradStep(spark, dir).queryExecution.executedPlan
    val plan = root match { case a: AdaptiveSparkPlanExec => a.executedPlan; case p => p }
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"gradient must be a pure aggregate, no window pass:\n$plan")
    assert(!plan.toString.contains("SortAggregate"),
      s"gradient sums must hash-aggregate (map-side combined):\n$plan")
  }
}
