package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Multimodal}

/** q63 fixed-point PageRank and m64 perceptual-hash candidates. */
class GraphPhashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q63 conserves mass within the floor-loss bound; base rank is the floor") {
    val ranks = Graph.q63PageRank(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = ranks.length
    assert(n > 0)
    val S = 1000000000000L
    val mass = ranks.map(_._2).sum
    // each floor division loses < 1 unit per (edge, iteration) + per-node base;
    // the loss is bounded far below 1% of S
    assert(mass <= S && mass > S - S / 100, s"mass $mass vs scale $S")
    // every node holds at least the teleport base share
    val base = S * 15 / (100 * n)
    assert(ranks.forall(_._2 >= base))
    // ranks must differentiate (a uniform vector means the flow did nothing)
    assert(ranks.map(_._2).distinct.length > 1)
  }

  test("q66 degree-ordered orientation: exact edge bijection and √(2m) out-degree cap") {
    val (und, or) = Graph.orientedCoPurchase(spark, dir)
    val m = und.count()
    // orientation is a bijection on edges — nothing dropped or duplicated
    assert(or.count() == m)
    val maxOut = or.groupBy("u").count().agg(max("count")).head().getLong(0)
    val cap = math.ceil(math.sqrt(2.0 * m)).toLong
    // the hub-taming property the 100 TB wedge join relies on: if a node
    // had out-degree k, its k out-neighbors each have degree ≥ k, so
    // k(k+1)/2 ≤ m ⇒ k ≤ √(2m)
    assert(maxOut <= cap, s"max oriented out-degree $maxOut exceeds √(2m)=$cap")
    val maxUndirected = und.select(col("src").as("n"))
      .union(und.select(col("dst").as("n")))
      .groupBy("n").count().agg(max("count")).head().getLong(0)
    assert(maxOut < maxUndirected,
      s"orientation should tame hubs: out $maxOut !< undirected $maxUndirected")
  }

  test("q67 frontiers partition the reachable set: disjoint, and sum ≤ |V|") {
    val rows = Graph.q67KHopReach(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).sameElements(0 to 3))
    val nParts = Tables.lineitem(spark, dir).select("l_partkey").distinct().count()
    // new-node counts are an anti-joined partition of reachable nodes —
    // their sum can never exceed the vertex count
    assert(rows.map(_._2).sum <= nParts)
    assert(rows.head._2 > 0, "seed set must be non-empty at every SF")
  }

  test("q63 rank order is stable across thread counts") {
    val a = Graph.q63PageRank(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Graph.q63PageRank(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("m64 candidates share a band by construction and the strict bar stays honest") {
    val rows = Multimodal.m64PhashCandidates(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "banding found no candidates — join shape broken")
    assert(rows.forall { case (a, b, h) => a < b && h >= 0 && h <= 64 })
    // fake-image corpus: no candidate clears a strict visual-dup bar —
    // the report must not be vacuously 'all duplicates'
    assert(rows.forall(_._3 > 6), "unexpected near-identical pair in synthetic corpus")
  }

  test("m64 pigeonhole: byte-identical twins collide on every band, hamming 0") {
    import spark.implicits._
    val planted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "zzz completely different payload with other characters zzzz a")
    ).toDF("media_id", "text")
    val rows = Multimodal.phashCandidatesFrom(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.contains((1L, 2L, 0L)), s"twins must collide with hamming 0: ${rows.toSeq}")
    assert(!rows.exists { case (a, b, h) => Set(a, b) != Set(1L, 2L) && h == 0 },
      "distinct payloads must not report hamming 0")
  }
}
