package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("t50 langid: argmax is deterministic and scores count stopword hits") {
    import spark.implicits._
    val df = TextOps.t50LangId(spark, dir)
    val cols = df.columns.toSet
    assert(Set("doc_id", "pred_lang", "en_score").subsetOf(cols))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // pred_lang is always one of the profiled languages
    val langs = TextOps.stopwords.keySet
    assert(rows.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
    // argmax consistency: pred score >= every other language score
    val langCols = TextOps.stopwords.keys.toSeq.sorted
    rows.foreach { r =>
      val pred = r.getAs[String]("pred_lang")
      val predScore = r.getAs[Int](s"${pred}_score")
      langCols.foreach(l => assert(predScore >= r.getAs[Int](s"${l}_score")))
    }
    // hand-checked doc: stopword-only text scores exactly its hits
    val hand = Seq(("x1", "en", "the cat of the house and a dog"))
      .toDF("doc_id", "lang", "text")
    hand.createOrReplaceTempView("handdoc")
    val scored = hand.select(
      size(filter(split(col("text"), " "),
        t => t.isin(TextOps.stopwords("en"): _*))).as("s")).collect()
    assert(scored(0).getInt(0) == 5) // the, of, the, and, a
  }

  test("t51 quality: score is in [0,1] and monotone pieces behave") {
    val rows = TextOps.t51Quality(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0, s"quality_score out of range: $q")
      assert(r.getAs[Number]("n_punct").longValue <= r.getAs[Int]("n_chars_calc"))
    }
  }

  test("t52 token counts: regex tokens >= whitespace tokens on punctuated text") {
    import spark.implicits._
    val df = Seq(("d1", "en", "hello, world! it's 2026."))
      .toDF("doc_id", "lang", "text")
    val out = df.select(
      size(split(col("text"), " ")).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z0-9_]+|[^a-zA-Z0-9_ ]")).as("re_tokens"))
      .collect()(0)
    assert(out.getInt(0) == 4)
    // hello , world ! it ' s 2026 .  => 9
    assert(out.getAs[Number](1).longValue == 9L)
  }

  test("t53 fingerprint: identical normalized text collides; distinct text does not") {
    import spark.implicits._
    val df = Seq(
      ("a", "en", "The  quick brown fox"),
      ("b", "en", "the quick  brown fox "), // same after normalization
      ("c", "en", "a completely different document body"))
      .toDF("doc_id", "lang", "text")
    df.write.mode("overwrite").parquet("/tmp/textops_spec_docs/documents.parquet")
    val fp = TextOps.t53Fingerprint(spark, "/tmp/textops_spec_docs").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp("a")._1 == fp("b")._1, "normalized duplicates share content_md5")
    assert(fp("a")._2 == fp("b")._2, "and share min shingle hash")
    assert(fp("a")._1 != fp("c")._1)
  }
}
