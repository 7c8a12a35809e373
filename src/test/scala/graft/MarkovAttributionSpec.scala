package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventWindows

/** q112 Markov removal-effect attribution: the transition matrix against
  * a naive path walk over the real events, a hand-derived two-path
  * chain with exact credits, and the model's structural invariants.
  */
class MarkovAttributionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q112 transition matrix matches a naive path walk") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val naive = collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for ((_, rows) <- ev.groupBy(_._1)) {
      val path = rows.sortBy(r => (r._3, r._4)).map(_._2)
      val cut = path.indexOf("purchase")
      val states = (if (cut >= 0) path.take(cut + 1) else path)
        .map(t => if (t == "purchase") "conv" else t)
      val full = ("start" +: (if (cut >= 0) states else states :+ "null")).toSeq
      for (pair <- full.sliding(2); if pair.length == 2)
        naive(pair(0) -> pair(1)) = naive(pair(0) -> pair(1)) + 1L
    }
    val got = EventWindows.markovTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == naive.toMap, s"cells differ: ${(got.toSet diff naive.toSet)} / ${(naive.toSet diff got.toSet)}")
  }

  test("q112 hand-derived two-path chain: removal credit lands on the converting channel") {
    // user 1: click -> purchase; user 2: view (no conversion).
    //   start->click, click->conv, start->view, view->null
    // P(conv) = 1/2 exactly; removing click kills the only converting
    // path (re = 1, all attribution); removing view changes nothing.
    val d = java.nio.file.Files.createTempDirectory("graft-markov").toString
    val s = spark; import s.implicits._
    Seq(
      (1L, "click", java.sql.Timestamp.valueOf("2020-01-01 00:00:01"), 1L),
      (1L, "purchase", java.sql.Timestamp.valueOf("2020-01-01 00:00:02"), 2L),
      (2L, "view", java.sql.Timestamp.valueOf("2020-01-01 00:00:03"), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = EventWindows.q112MarkovAttribution(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("click", "error", "signup", "view"))
    for ((_, (p, _, _, _)) <- got) assert(p == 0.5, "P(conv) must be exactly 1/2")
    assert(got("click") == ((0.5, 0.0, 1.0, 1.0)), s"click: ${got("click")}")
    assert(got("view") == ((0.5, 0.5, 0.0, 0.0)), s"view: ${got("view")}")
    assert(got("error") == ((0.5, 0.5, 0.0, 0.0)))
    assert(got("signup") == ((0.5, 0.5, 0.0, 0.0)))
  }

  test("q112 invariants on real events: probabilities bounded, removal never helps, credits sum to 1") {
    val rows = EventWindows.q112MarkovAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("click", "error", "signup", "view"))
    val p = rows.head._2
    assert(rows.forall(_._2 == p), "one full-chain P(conv) on every row")
    assert(p > 0.0 && p <= 1.0)
    for ((ch, _, pr, re, _) <- rows) {
      assert(pr >= 0.0 && pr <= p + 1e-9, s"$ch: removal must not increase conversion")
      assert(re >= 0.0 && re <= 1.0, s"$ch removal effect in [0,1]")
    }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, "attribution shares sum to 1")
  }
}
