package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audits, Temporal}

/** Round-14 additions: the ADVICE r13 degenerate-class guards (q148
  * Mood's median, q142 CCF), the ModelCache keying rework (config
  * fingerprint + application scoping + releaseAll), and the t77/t78
  * order-independence pin over the frozen KN model memo.
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  // ----------------------------------------------- q148 degenerate guard
  test("q148 Mood's median: all-equal corpus reads NULL chi2, not NaN-as-0") {
    val s = spark; import s.implicits._
    // every value equal → nothing strictly above the pooled median →
    // aa = 0 → ea = 0: the unguarded form divides 0/0
    val allEq = Seq(("A", 100L), ("A", 100L), ("B", 100L), ("B", 100L))
      .toDF("grp", "cents")
    val rows = Audits.moodMedianFrom(allEq).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("chi2_mood")),
        s"degenerate corpus must read chi2_mood NULL, got $r")
      assert(r.getAs[Long]("n_above") == 0L)
    }
    // non-degenerate frame still computes through the same path
    val mixed = Seq(("A", 1L), ("A", 2L), ("A", 3L),
        ("B", 10L), ("B", 11L), ("B", 12L)).toDF("grp", "cents")
    val rows2 = Audits.moodMedianFrom(mixed).collect()
    assert(rows2.length == 2 &&
      rows2.forall(r => !r.isNullAt(r.fieldIndex("chi2_mood"))))
    // perfectly separated: every B above, no A above → chi² = n
    assert(rows2.forall(r => r.getAs[Double]("chi2_mood") == 6.0))
  }

  // ----------------------------------------------- q142 degenerate guard
  test("q142 CCF: a constant series reads NULL ccf at every lag, not NaN") {
    val s = spark; import s.implicits._
    val daily = (1 to 10).map(i =>
        (java.sql.Date.valueOf(f"2024-01-$i%02d"), 500L, (i * 37 % 11).toLong))
      .toDF("day", "x_c", "y_c")
    val rows = Temporal.ccfFrom(daily).collect()
    assert(rows.length == 15) // lags −7..7 all have aligned pairs
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("ccf"))),
      "constant-x series must read ccf NULL at every lag")
    // varying series through the same path: lag 0 is plain Pearson of
    // a series with itself here (y = x) → 1.0
    val live = (1 to 10).map(i =>
        (java.sql.Date.valueOf(f"2024-02-$i%02d"), i * 10L, i * 10L))
      .toDF("day", "x_c", "y_c")
    val l0 = Temporal.ccfFrom(live).collect()
      .find(_.getAs[Long]("lag") == 0L).get
    assert(l0.getAs[Double]("ccf") == 1.0)
  }

  // ------------------------------------ KN model: mode invariance + order
  test("t77 is sum-mode invariant (the memoized KN frame carries no mode)") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("t77_kn_lm_score")
    val fast = q(spark, dir).collect().map(_.toSeq).toSeq
    sys.props("graft.sums") = "decimal"
    val audit = try q(spark, dir).collect().map(_.toSeq).toSeq
    finally { sys.props.remove("graft.sums"); () }
    assert(fast.nonEmpty && fast == audit,
      "KN gate output must be identical under long and decimal sum modes")
  }

  // -------------------------------------- constraint-shedding checkpoint
  test("Checkpoints.fresh sheds attribute constraints so state frames can be reused") {
    import org.apache.spark.sql.functions.col
    val s = spark; import s.implicits._
    // a filter plants an attribute-level constraint — exactly what a
    // batch slice (vec_id <= cut) carries into d64/m70 fold state
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v").filter(col("id") > 0)
    val f1 = graft.operators.Checkpoints.fresh(base, "id", "v")
    val f2 = graft.operators.Checkpoints.fresh(base, "id", "v")
    // filter-derived predicates must be shed (only nullability-derived
    // isnotnull of the frame's own outputs may remain), and each mint
    // must carry fresh ids — together these keep union children
    // id-distinct and constraint-safe under Catalyst's re-instancing
    val cs = f1.queryExecution.analyzed.constraints
    assert(cs.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull]),
      s"fresh() must shed filter-derived constraints, kept: $cs")
    val ids1 = f1.queryExecution.analyzed.output.map(_.exprId).toSet
    val ids2 = f2.queryExecution.analyzed.output.map(_.exprId).toSet
    assert(ids1.intersect(ids2).isEmpty, "each mint must carry fresh attribute ids")
    // the d64 reuse shape that crashed with a plain localCheckpoint:
    // union two minted frames, then self-join the union against one of
    // them — must plan and execute
    val u = f1.unionByName(f2)
    val n = u.as("a").join(f1.as("b"), col("a.id") === col("b.id")).count()
    assert(n == 4L)
  }

  // --------------------------------------------- d64 incremental SemDeDup
  test("d64: 2- and 3-batch incremental folds equal the from-scratch d48 SemDeDup") {
    import org.apache.spark.sql.functions.{col, max}
    val dir = "/root/testdata/sf0.001"
    val want = graft.operators.Similarity.d48SemDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty)
    assert(want.exists(r => r(3) == 0), "fixture must contain semantic dups")
    val raw = Tables.embeddings(spark, dir)
    val cents = graft.operators.Similarity.sampleCentroids(raw)
    val mx = raw.agg(max(col("vec_id"))).head().getLong(0)
    for (k <- Seq(2, 3)) {
      val cuts = (1 to k).map(i => mx * i / k)
      val batches = (-1L +: cuts.dropRight(1).map(_.toLong)).zip(cuts).map {
        case (lo, hi) => raw.filter(col("vec_id") > lo && col("vec_id") <= hi)
      }
      val got = graft.operators.Similarity.incrementalSemDedup(batches, cents)
        .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
      assert(got == want, s"$k-batch incremental fold diverged from d48")
    }
  }

  // ------------------------------------------- d65 kNN topic clustering
  test("d65: every vector labeled, cluster id = min member, non-trivial topics exist") {
    val rows = graft.operators.Similarity
      .d65KnnTopicClusters(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nVec = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(rows.length.toLong == nVec, "every corpus vector must be labeled")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(cid == ms.map(_._1).min, s"cluster $cid must be its min member id")
      assert(ms.forall(_._3 == ms.length.toLong), "n_members must equal group size")
    }
    assert(byCluster.exists(_._2.length > 1),
      "mutual-kNN graph must yield at least one multi-member topic")
    assert(byCluster.size > 1, "corpus must not collapse to one topic")
  }

  // ---------------------------------------------- m70 incremental phash
  test("m70: 2- and 3-batch incremental folds equal the from-scratch m66 clustering") {
    import org.apache.spark.sql.functions.{col, decode, max}
    val dir = "/root/testdata/sf0.001"
    val want = graft.operators.Multimodal.m66PhashClusters(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty, "fixture must contain visual near-dup clusters")
    val img = graft.operators.Multimodal.mediaTable(spark, dir)
      .where(col("meta.format").isin("png", "jpeg"))
      .select(col("media_id"), decode(col("media"), "UTF-8").as("text"))
    val mx = img.agg(max(col("media_id"))).head().getLong(0)
    for (k <- Seq(2, 3)) {
      val cuts = (1 to k).map(i => mx * i / k)
      val batches = (-1L +: cuts.dropRight(1).map(_.toLong)).zip(cuts).map {
        case (lo, hi) => img.filter(col("media_id") > lo && col("media_id") <= hi)
      }
      val got = graft.operators.Multimodal.incrementalPhashClusters(batches)
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"$k-batch incremental phash fold diverged from m66")
    }
  }

  test("t77/t78 results are independent of run order through the shared memo") {
    val dir = "/root/testdata/sf0.001"
    def run(name: String): Seq[Seq[Any]] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
    ModelCache.releaseAll(spark)
    val a77 = run("t77_kn_lm_score")
    val a78 = run("t78_perplexity_buckets")
    ModelCache.releaseAll(spark)
    val b78 = run("t78_perplexity_buckets")
    val b77 = run("t77_kn_lm_score")
    assert(a77.nonEmpty && a78.nonEmpty)
    assert(a77 == b77, "t77 must not depend on whether t78 built the model")
    assert(a78 == b78, "t78 must not depend on whether t77 built the model")
  }
}
