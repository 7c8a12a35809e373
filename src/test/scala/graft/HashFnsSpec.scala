package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashFns
import graft.operators.PortableHash

/** The r18 fast-path hash expressions must be BIT-IDENTICAL to the
  * built-in spellings they replace — the portable-hash contract every
  * hash-grade oracle query rides on:
  *
  *   md5_bits60(s)    ≡ conv(substring(md5(s), 1, 15), 16, 10)::long
  *   hex_bits60(h, o) ≡ conv(substring(h, o, 15), 16, 10)::long
  *
  * Pinned on adversarial inputs (empty string, unicode, long strings,
  * every d42 window offset) and on a corpus sample; null-propagation
  * matches the built-ins.
  */
class HashFnsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private def oldH60 = (c: org.apache.spark.sql.Column) =>
    conv(substring(md5(c.cast(StringType)), 1, 15), 16, 10).cast(LongType)

  test("md5_bits60 equals conv(substring(md5)) on adversarial + random strings") {
    import spark.implicits._
    val inputs = Seq("", "a", "0", "hello world", "ümläut-ünïcode-€",
      "x" * 10000, "line\nbreak\ttab", "1:foo bar baz") ++
      (0 until 2000).map(i => s"doc-$i:${i * 2654435761L}")
    val df = inputs.toDF("s")
      .select(col("s"), oldH60(col("s")).as("ref"),
        PortableHash.h60(col("s")).as("fast"))
    assert(df.filter(col("ref") =!= col("fast")).count() === 0)
    assert(df.filter(col("fast") < 0L || col("fast") >= lit(PortableHash.HashSpace.toLong)).count() === 0)
  }

  test("hex_bits60 equals conv(substring) at both d42 window offsets") {
    import spark.implicits._
    val df = (0 until 2000).map(i => s"v$i").toDF("s")
      .select(md5(col("s")).as("h"))
      .select(
        conv(substring(col("h"), 1, 15), 16, 10).cast(LongType).as("r1"),
        conv(substring(col("h"), 17, 15), 16, 10).cast(LongType).as("r17"),
        HashFns.hexBits60(col("h"), 1).as("f1"),
        HashFns.hexBits60(col("h"), 17).as("f17"))
    assert(df.filter(col("r1") =!= col("f1") || col("r17") =!= col("f17")).count() === 0)
  }

  test("fast_md5 equals the built-in md5 on adversarial + random strings") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "ümläut-ünïcode-€", "x" * 10000,
      "line\nbreak\ttab") ++ (0 until 2000).map(i => s"doc-$i:${i * 31}")
    val df = inputs.toDF("s")
      .select(md5(col("s")).as("ref"), HashFns.fastMd5(col("s")).as("fast"))
    assert(df.filter(col("ref") =!= col("fast")).count() === 0)
  }

  test("null propagation matches the built-ins") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(PortableHash.h60(col("s")).as("fast"), oldH60(col("s")).as("ref"),
        HashFns.hexBits60(md5(col("s")), 1).as("fhex"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    rows.foreach { r => assert(r.isNullAt(0) === r.isNullAt(1) && r.isNullAt(0) === r.isNullAt(2)) }
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    import spark.implicits._
    val inputs = (0 until 200).map(i => s"interp-$i")
    val ref = inputs.toDF("s").select(oldH60(col("s")).as("v")).collect().map(_.getLong(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val fast = inputs.toDF("s").select(PortableHash.h60(col("s")).as("v"))
        .collect().map(_.getLong(0))
      assert(fast.toSeq === ref.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
