package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup}

/** Incremental curation ≡ from-scratch (VERDICT r04 item 7).
  *
  * The sf0.001 corpus is folded in as three id-ordered batches
  * (ids <100, 100-299, ≥300); after EVERY batch the incremental state's
  * curated output must equal c70's from-scratch pipeline over the
  * prefix — same rows, same scores, exactly. The split points run
  * through known near-dup clusters (e.g. {8, 12, 120, 360}), so the
  * cross-batch paths — a new doc linking into an existing cluster, and
  * linkage through a batch-1 LOSER's retained bands — are exercised by
  * real data, which the spec asserts rather than assumes.
  */
class IncrementalCurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Double)] =
    df.select("doc_id", "pred_lang", "quality_score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sortBy(_._1)

  test("incremental advance over three id-ordered batches matches from-scratch at every prefix") {
    val docs = Tables.documents(spark, dir)
    val cuts = Seq(100L, 300L, Long.MaxValue)
    var state = Curation.emptyState(spark)
    var lo = Long.MinValue
    for (hi <- cuts) {
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      state = Curation.advance(state, batch)
      val got = rows(Curation.curated(state))
      val want = rows(Curation.curateFrom(docs.filter(col("doc_id") < hi)))
      assert(want.nonEmpty, s"from-scratch prefix < $hi is empty")
      assert(got == want,
        s"prefix < $hi: incremental diverged from from-scratch\n" +
          s"only incremental: ${got.diff(want).take(5)}\n" +
          s"only from-scratch: ${want.diff(got).take(5)}")
      lo = hi
    }
  }

  test("c72 prep pipeline: survivors = keepers ∩ both gates; packing tiles survivors only") {
    import graft.operators.TextOps
    val out = Curation.c72PrepPipeline(spark, dir).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    // provenance: every survivor passes each stage, and no passing doc
    // is missing (set equality against the independently-run stages)
    val keepers = Dedup.dedupExact(
        Tables.documents(spark, dir).withColumn("__h", md5(col("text"))),
        Seq("__h"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rep = TextOps.t55Repetition(spark, dir)
      .filter(col("passes_gate") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val boi = TextOps.t56Boilerplate(spark, dir)
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (keepers & rep & boi))
    // packing: offsets tile the SURVIVOR stream per source, gapless
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      var expect = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("start_offset") == expect)
        assert(r.getAs[Long]("shard") == expect / 512)
        expect += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("the data actually exercises cross-batch linkage (a cluster spans batches)") {
    val clusters = Dedup.connectedComponents(
        Dedup.minhashNearDupPairsFrom(Tables.documents(spark, dir)),
        "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def batchOf(id: Long): Int = if (id < 100) 0 else if (id < 300) 1 else 2
    val spanning = clusters.groupBy(_._2)
      .filter { case (_, ms) => ms.map(m => batchOf(m._1)).distinct.size >= 2 }
    assert(spanning.nonEmpty,
      "no near-dup cluster spans a batch boundary — the equivalence test " +
        "would not exercise incremental linkage; adjust the cut points")
  }
}
