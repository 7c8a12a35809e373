package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventWindows, Multimodal}

/** q64 rolling 3σ anomaly fence and m65 scene-change detection. */
class RollingSceneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q64 flags exactly the rows a naive trailing-window recompute flags") {
    val got = EventWindows.q64RollingAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "fence must fire somewhere on this corpus")
    val raw = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = scala.collection.mutable.Set.empty[(String, Long)]
    for ((_, rows) <- raw.groupBy(_._1)) {
      val ordered = rows.sortBy(r => (r._2, r._3))
      for (i <- ordered.indices) {
        val frame = ordered.slice(math.max(0, i - 23), i + 1)
        val n = frame.length.toLong
        if (n >= 12) {
          val s = frame.map(_._4).sum
          val sxx = frame.map(v => v._4 * v._4).sum
          val v = ordered(i)._4
          if ((n * v - s) * (n * v - s) > 9L * (n * sxx - s * s))
            expect += ((ordered(i)._1, ordered(i)._3))
        }
      }
    }
    assert(got == expect.toSet)
  }

  test("m65 scene changes match a naive per-media frame-delta recompute") {
    val got = Multimodal.m65SceneChanges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "corpus must contain at least one >10% luma shift")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._1 % 4 == 3)
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for ((id, text) <- docs) {
      val frames = text.map(_.toLong).grouped(64).toArray
      for (f <- 1 until frames.length) {
        val (luma, flen) = (frames(f).sum, frames(f).length.toLong)
        val (prev, prevlen) = (frames(f - 1).sum, frames(f - 1).length.toLong)
        val delta = math.abs(luma * prevlen - prev * flen)
        if (delta * 10 > prev * flen) expect += ((id, f.toLong, delta))
      }
    }
    assert(got.toSet == expect.toSet)
    assert(got.sortBy(r => (r._1, r._2)).sameElements(got), "output totally ordered")
  }
}
