package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.FakeCodec

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("media table: binary payload + typed metadata, payload pruned from meta-only plans") {
    val media = Multimodal.mediaTable(spark, dir)
    assert(media.schema("media").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    // catalog query must not read the payload column from parquet:
    // pruning keeps the scan schema to the metadata inputs
    val plan = Multimodal.m60MediaCatalog(spark, dir)
      .queryExecution.executedPlan.toString
    // the scan reads only the columns meta/payload derive from
    assert(plan.contains("doc_id") && plan.contains("n_chars"))
  }

  test("m60 catalog over a materialized media table never reads the payload column") {
    // the real-lakehouse shape: media table at rest as parquet; the
    // catalog aggregation must push a media-free ReadSchema to the scan
    val tmp = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.mediaTable(spark, dir).write.mode("overwrite").parquet(tmp)
    val catalog = Multimodal.mediaCatalog(spark.read.parquet(tmp))
    // AQE wraps the physical plan, so inspect the rendered scan lines:
    // every parquet scan's ReadSchema must exclude the payload column
    val readSchemas = catalog.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema"))
      .map(_.split("ReadSchema:")(1)).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { schema =>
      assert(!schema.contains("media"), s"catalog scan reads the payload: $schema")
    }
    // and the result matches the in-line table's catalog
    assert(catalog.collect().toSeq ==
      Multimodal.m60MediaCatalog(spark, dir).collect().toSeq)
  }

  test("m61 decode: deterministic stub features, one row per media, exact recompute") {
    val out = Multimodal.m61DecodeFeatures(spark, dir).collect()
    val n = Multimodal.mediaTable(spark, dir).count()
    assert(out.length == n)
    // recompute one row's stub decode on the driver and compare exactly
    val first = Multimodal.mediaTable(spark, dir)
      .orderBy(col("media_id")).select(col("media_id"), col("media")).head()
    val bytes = first.getAs[Array[Byte]]("media")
    val luma = FakeCodec.decodeLuma(bytes)
    val got = out.find(_.getLong(0) == first.getLong(0)).get
    assert(got.getAs[Double]("mean_luma") == luma.sum.toDouble / luma.length)
    assert(got.getAs[Double]("f0") == FakeCodec.features(bytes)(0).toDouble)
    assert(got.getAs[Int]("n_bytes") == bytes.length)
    // feature vector dim is stable
    assert(FakeCodec.features(bytes).length == FakeCodec.FeatureDim)
  }

  test("m61 oracle precondition: corpus is ASCII (payload byte == codepoint)") {
    // the DuckDB oracle recomputes byte sums via unicode(substr(text,i,1)),
    // which equals the utf-8 byte only for ASCII text — assert it holds
    // ASCII ⇔ utf-8 byte count equals character count
    val nonAscii = Multimodal.mediaTable(spark, dir)
      .filter(octet_length(col("media")) =!= length(decode(col("media"), "UTF-8")))
      .count()
    assert(nonAscii == 0)
  }

  test("m61 runs decode distributed across partitions, not on the driver") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, dir).repartition(4)
    val parts = Multimodal.decodeFeatures(media)
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(parts.length == 4 && parts.sum == media.count())
  }

  test("m62 frame sampling: every 4th 64-byte chunk, covers the payload") {
    val rows = Multimodal.m62FrameSample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_no") % 4 == 0)
      val fb = r.getAs[Number]("frame_bytes").intValue
      assert(fb > 0 && fb <= 64)
    }
    // frame 0 always present per media
    val byMedia = rows.groupBy(_.getLong(0))
    byMedia.values.foreach(fs => assert(fs.exists(_.getAs[Int]("frame_no") == 0)))
  }

  test("stub features feed the ANN path: cosine of identical payloads is 1") {
    import graft.functions.Vectors
    Vectors.register(spark)
    import spark.implicits._
    val f = FakeCodec.features("same bytes".getBytes("UTF-8"))
    val df = Seq((1L, f), (2L, f)).toDF("id", "feature")
    val sim = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(Vectors.vecCosine(col("a.feature"), col("b.feature")).as("sim"))
      .head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
  }
}
