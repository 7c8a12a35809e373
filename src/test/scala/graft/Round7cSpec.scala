package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.operators.{Dedup, Relational, TextOps}

/** Semantics of the round-7 third batch: group-wise OLS regression (q56),
  * correlation matrix (q57), MAD outlier fence (q58), SCD-2 intervals
  * (q59), text normalization + NFC expression (t63), record linkage
  * (d53). Each is pinned against an independent in-memory recomputation
  * (the DuckDB hash gate covers cross-engine equality; these specs cover
  * the MEANING).
  */
class Round7cSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("q56 matches a naive driver-side OLS fit per brand") {
    val got = Relational.q56Regression(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val raw = graft.Tables.lineitem(spark, dir)
      .join(graft.Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty && got.keySet == raw.map(_._1).toSet)
    for ((brand, rows) <- raw.groupBy(_._1)) {
      val n = rows.length.toDouble
      val xs = rows.map(_._2); val ys = rows.map(_._3)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val r2 = math.pow(n * sxy - sx * sy, 2) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gn, gs, gi, gr) = got(brand)
      assert(gn == rows.length)
      // engine works on the cents grid; naive fit on raw doubles — the
      // slope is scale-free, intercept is reported in dollars
      assert(math.abs(gs - slope) < 1e-6 * math.max(1.0, math.abs(slope)), s"$brand slope")
      assert(math.abs(gi - intercept) < 1e-4 * math.max(1.0, math.abs(intercept)), s"$brand intercept")
      assert(math.abs(gr - r2) < 1e-6, s"$brand r2")
      assert(gr >= 0.0 && gr <= 1.0)
    }
  }

  test("q57 correlations are in [-1,1] and match a naive Pearson") {
    val got = Relational.q57CorrMatrix(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val raw = graft.Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long"),
        hour(col("ts")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble, r.getLong(2).toDouble))
    for ((et, rows) <- raw.groupBy(_._1)) {
      val n = rows.length.toDouble
      val vs = rows.map(_._2); val hs = rows.map(_._3)
      val num = n * vs.zip(hs).map { case (a, b) => a * b }.sum - vs.sum * hs.sum
      val den = math.sqrt((n * vs.map(a => a * a).sum - vs.sum * vs.sum) *
        (n * hs.map(a => a * a).sum - hs.sum * hs.sum))
      val (gn, cvh, cvd, chd) = got(et)
      assert(gn == rows.length)
      assert(math.abs(cvh - num / den) < 1e-9, s"$et corr_value_hour")
      assert(Seq(cvh, cvd, chd).forall(c => c >= -1.0 && c <= 1.0))
    }
  }

  test("q58 median/MAD are exact lower order statistics; fence count matches") {
    val got = Relational.q58MadOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val raw = graft.Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for ((et, rows) <- raw.groupBy(_._1)) {
      val vs = rows.map(_._2).sorted
      val med = vs((vs.length + 1) / 2 - 1)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs((devs.length + 1) / 2 - 1)
      val nOut = devs.count(_ > 3 * mad)
      val (gn, gmed, gmad, gout) = got(et)
      assert(gn == vs.length)
      assert(gmed == med.toDouble / 100.0, s"$et median")
      assert(gmad == mad.toDouble / 100.0, s"$et mad")
      assert(gout == nOut, s"$et outlier count")
    }
  }

  test("q59 SCD2 intervals chain, versions are consecutive, one current row each") {
    val rows = Relational.q59Scd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2),
        Option(r.getAs[java.time.LocalDateTime](3)),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_._1)) {
      val seq = rs.sortBy(_._6)
      assert(seq.map(_._6).toSeq == (1L to seq.length).toSeq, "versions consecutive")
      // exactly one open interval, and it is the last version
      assert(seq.count(_._4.isEmpty) == 1 && seq.last._4.isEmpty)
      assert(seq.forall(r => (r._5 == 1L) == r._4.isEmpty))
      // adjacent intervals chain and priorities actually change
      for ((a, b) <- seq.zip(seq.drop(1))) {
        assert(a._4.contains(b._3), "valid_to == next valid_from")
        assert(a._2 != b._2, "adjacent priorities must differ")
      }
      assert(seq.forall(r => r._4.forall(t => !t.isBefore(r._3))), "from <= to")
    }
  }

  test("t63 normalization round-trips the planted mess back to the canonical text") {
    val norm = TextOps.t63Normalize(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val orig = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm.keySet == orig.keySet)
    for ((id, (nDirty, n)) <- norm) {
      assert(n == orig(id), s"doc $id: normalization did not invert the dirtying")
      // the dirty projection must actually be longer (double spaces added)
      assert(nDirty > orig(id).length, s"doc $id: dirtying was vacuous")
    }
  }

  test("NFC expression composes decomposed Unicode (interpreted + codegen)") {
    import spark.implicits._
    TextFns.register(spark)
    val decomposed = "e\u0301te\u0301" // e + U+0301 COMBINING ACUTE, twice (NFD)
    val composed = "\u00e9t\u00e9"     // precomposed U+00E9, NFC form
    val out = Seq(decomposed, composed, "plain ascii")
      .toDF("s").select(TextFns.nfc(col("s")).as("n")).collect().map(_.getString(0))
    assert(out(0) == composed, "decomposed input must compose")
    assert(out(1) == composed, "already-NFC input is a fixed point")
    assert(out(2) == "plain ascii", "ASCII is untouched")
    // interpreted path (no codegen): evaluate via the expression directly
    val expr = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed),
        org.apache.spark.sql.types.StringType))
    assert(expr.eval(null).toString == composed)
  }

  test("d53 pairs stay inside blocks, below the distance cap, vocabulary-bounded") {
    val rows = Dedup.d53RecordLinkage(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    for ((na, nb, _, dist, nA, nB, idA, idB) <- rows) {
      assert(na < nb, "canonical pair order")
      assert(na.split(" ")(1) == nb.split(" ")(1), "same noun block")
      assert(dist >= 1 && dist <= 4, "names differ but within the cap")
      assert(nA >= 1 && nB >= 1 && idA != idB)
    }
    // pair space is over distinct entities: no (name_a, name_b, size) dup
    val keys = rows.map(r => (r._1, r._2, r._3))
    assert(keys.distinct.length == keys.length)
  }
}
