package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** t73/t74 deterministic corpus shuffle-shard: the permutation property
  * (every position exactly once, corpus preserved, reproducible,
  * non-trivial), the shard-size bound (equal ±1 by the rank formula),
  * and manifest ≡ a naive recompute from the per-doc assignment.
  */
class ShuffleShardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  private def rows() = Sampling.t73ShuffleShard(spark, dir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("t73 is a permutation of the corpus: every position once, every doc once") {
    val got = rows()
    val n = got.length.toLong
    assert(got.map(_._2).toSet == (1L to n).toSet, "positions must be exactly 1..n")
    val ids = Tables.documents(spark, dir).select("doc_id").collect().map(_.getLong(0))
    assert(got.map(_._1).toSet == ids.toSet, "every doc appears exactly once")
    assert(n == ids.length.toLong)
  }

  test("t73 is reproducible and not the identity order") {
    val a = rows(); val b = rows()
    assert(a.toSeq == b.toSeq, "same data + same seed must reproduce the permutation")
    // hash order must actually shuffle: the doc_id sequence along
    // shuffle_pos is not monotone (P(identity) ~ 1/n! on real data)
    val along = a.sortBy(_._2).map(_._1).toSeq
    assert(along != along.sorted, "the permutation must not be the identity")
  }

  test("shards are contiguous position ranges of size equal ±1, in 0..K-1") {
    val got = rows()
    val n = got.length.toLong
    val k = 8L // mirrors ShuffleShards; a constant change must fail loudly
    val byShard = got.groupBy(_._3)
    assert(byShard.keySet == (0L until k).toSet)
    val sizes = byShard.values.map(_.length.toLong)
    assert(sizes.max - sizes.min <= 1L, s"shard sizes must be equal ±1: $sizes")
    // each doc's shard is the rank formula, and ranges tile [1..n]
    for ((id, pos, shard) <- got)
      assert(shard == (pos - 1) * k / n, s"doc $id shard formula")
    val bounds = byShard.toSeq.sortBy(_._1)
      .map { case (s, rs) => (s, rs.map(_._2).min, rs.map(_._2).max) }
    assert(bounds.head._2 == 1L && bounds.last._3 == n)
    for (Seq((_, _, hi), (_, lo, _)) <- bounds.sliding(2))
      assert(lo == hi + 1, "shard ranges must tile the position space")
  }

  test("t74 manifest matches a naive recompute from the per-doc assignment") {
    val naive = rows().groupBy(_._3).map { case (s, rs) =>
      s -> ((rs.length.toLong, rs.map(_._2).min, rs.map(_._2).max,
        rs.map(_._1).reduce(_ ^ _)))
    }
    val got = Sampling.t74ShardManifest(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == naive)
  }
}
