package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventWindows, Multimodal}

/** Semantics of the round-7 fourth batch: OHLC resample bars (q60),
  * first-k path mining (q61), audio frame-energy VAD (m63).
  */
class Round7dSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q60 bars agree with a naive per-(type,day) recomputation") {
    val got = EventWindows.q60OhlcBars(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    val raw = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def dayOf(us: Long): String =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    assert(got.nonEmpty)
    for (((et, day), rows) <- raw.groupBy(r => (r._1, dayOf(r._2)))) {
      val ordered = rows.sortBy(r => (r._2, r._3))
      val (o, h, l, c, n) = got((et, day))
      assert(n == rows.length)
      assert(o == ordered.head._4 / 100.0, s"$et $day open")
      assert(c == ordered.last._4 / 100.0, s"$et $day close")
      assert(h == rows.map(_._4).max / 100.0 && l == rows.map(_._4).min / 100.0)
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("q61 paths are first-3 journeys; counts cover users; order is total") {
    val rows = EventWindows.q61PathMining(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 2))
    // every path has at most 3 steps drawn from the event-type alphabet
    val types = graft.Tables.events(spark, dir)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    assert(rows.forall(_._1.split(">").length <= 3))
    assert(rows.forall(_._1.split(">").forall(types.contains)))
    // ordering: count desc, then path asc
    assert(rows.zip(rows.drop(1)).forall { case ((pa, na), (pb, nb)) =>
      na > nb || (na == nb && pa < pb)
    })
    // naive recomputation of one arbitrary user's path must appear iff shared
    val firstK = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (_, es) => es.sortBy(e => (e._2, e._3)).take(3).map(_._4).mkString(">") }
      .groupBy(identity).view.mapValues(_.size).toMap
    val expect = firstK.filter(_._2 >= 2)
    assert(rows.toMap == expect)
  }

  test("m63 frame accounting: counts, gate, and first-voiced are consistent") {
    val rows = Multimodal.m63AudioVad(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(rows.nonEmpty)
    val lens = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, nFrames, nVoiced, firstVoiced, maxE) <- rows) {
      assert(id % 4 == 2, "only wav rows")
      val expFrames = (lens(id) + 159) / 160
      assert(nFrames == expFrames, s"media $id frame count")
      assert(nVoiced >= 0 && nVoiced <= nFrames)
      assert(firstVoiced.isEmpty == (nVoiced == 0L))
      assert(firstVoiced.forall(f => f >= 0 && f < nFrames))
      if (nVoiced > 0) assert(maxE > 160000L)
    }
    // the gate must actually discriminate somewhere in the corpus
    assert(rows.exists(r => r._3 < r._2), "every frame voiced — threshold vacuous")
    assert(rows.exists(_._3 > 0), "no frame voiced — threshold vacuous")
  }
}
