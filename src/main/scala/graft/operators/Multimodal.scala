package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}

/** Multimodal columns — image/audio/video carried as opaque `binary`
  * columns with typed metadata, the training-data-pipeline extension
  * (absent from the reference, whose only types are String/Double/Integer;
  * SURVEY.md §1.5).
  *
  * Design for 100 TB:
  *  - media bytes live in ONE binary column per row; metadata is a typed
  *    struct column so filters (format, dimensions, duration) push down
  *    to the scan WITHOUT touching the payload bytes — column pruning
  *    keeps `media` out of any query that doesn't decode.
  *  - decode / feature-extract run as typed `mapPartitions` over a
  *    repartitioned Dataset: partition = batch, one decoder context per
  *    partition (the standard pattern for native decoder handles), rows
  *    streamed through an Iterator so no partition is materialized.
  *  - frame sampling is a generator (posexplode over chunk offsets):
  *    one row per frame, partition-local, no shuffle.
  *
  * The actual codec is STUBBED (this environment ships no image/audio
  * libraries): [[FakeCodec]] is a deterministic stand-in that derives
  * pixels/samples from the bytes themselves. The Spark-side plumbing —
  * schema, batching, partitioning, generator shape, feature vectors
  * feeding the ANN operators — is real and is what the specs pin.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("meta", mediaMetaType),
    StructField("media", BinaryType)))

  final case class MediaMeta(format: String, width: Int, height: Int,
                             sample_rate: Int, n_frames: Int)
  final case class MediaRow(media_id: Long, meta: MediaMeta, media: Array[Byte])
  final case class DecodedRow(media_id: Long, format: String, n_bytes: Int,
                              mean_luma: Double, feature: Array[Float])

  /** Deterministic stand-in for an image/audio codec. A real deployment
    * swaps this object for JNI/javacpp bindings; nothing else changes.
    */
  object FakeCodec {
    val FeatureDim = 16

    /** STUB decode: "luminance" = bytes interpreted as unsigned. */
    def decodeLuma(bytes: Array[Byte]): Array[Int] = bytes.map(b => b & 0xff)

    /** STUB feature extractor: 16 positional byte-histogram moments —
      * deterministic in the payload, so tests can pin exact values.
      */
    def features(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        f(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      if (bytes.length > 0) {
        val n = math.max(1, bytes.length / FeatureDim)
        var j = 0
        while (j < FeatureDim) { f(j) /= n; j += 1 }
      }
      f
    }
  }

  /** The `documents` table lifted into a media table: payload = utf-8
    * bytes of the text, metadata derived deterministically. Stands in for
    * a real media lakehouse table (same shape: id + meta struct + blob).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        struct(
          when(col("doc_id") % 4 === 0, "png")
            .when(col("doc_id") % 4 === 1, "jpeg")
            .when(col("doc_id") % 4 === 2, "wav")
            .otherwise("mp4").as("format"),
          (col("n_chars") % 64 + 1).cast(IntegerType).as("width"),
          (col("n_chars") % 48 + 1).cast(IntegerType).as("height"),
          lit(16000).as("sample_rate"),
          (col("n_chars") % 16 + 1).cast(IntegerType).as("n_frames")).as("meta"),
        encode(col("text"), "UTF-8").as("media"))

  // -------------------------------------------------------------------
  // m60: media catalog scan — metadata-only query over the media table.
  // The payload column is pruned away: the scan must not read `media`.
  // -------------------------------------------------------------------
  def m60MediaCatalog(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(col("meta.format").as("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(octet_length(col("media"))).as("total_bytes"),
        avg(col("meta.width")).as("avg_width"),
        max(col("meta.n_frames")).as("max_frames"))
      .orderBy(col("format"))

  val m60MediaCatalogSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
      |    (n_chars % 64 + 1)::INT AS width,
      |    (n_chars % 16 + 1)::INT AS n_frames,
      |    encode(text) AS payload
      |  FROM documents)
      |SELECT format, COUNT(*) AS n_media,
      |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
      |  AVG(width) AS avg_width,
      |  MAX(n_frames) AS max_frames
      |FROM media
      |GROUP BY format
      |ORDER BY format""".stripMargin

  // -------------------------------------------------------------------
  // m61: batch decode + feature extraction — typed mapPartitions, one
  // codec context per partition, streaming iterator (rows-only check;
  // MultimodalSpec pins determinism, schema, and batch shape).
  // -------------------------------------------------------------------
  def decodeFeatures(media: DataFrame): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("meta"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder context goes here in a real codec
        rows.map { r =>
          val luma = FakeCodec.decodeLuma(r.media)
          DecodedRow(r.media_id, r.meta.format, r.media.length,
            if (luma.isEmpty) 0.0 else luma.sum.toDouble / luma.length,
            FakeCodec.features(r.media))
        }
      }
  }

  def m61DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(
        mediaTable(spark, dir).repartition(spark.sessionState.conf.numShufflePartitions))
      .select(col("media_id"), col("format"), col("n_bytes"),
        round(col("mean_luma"), 6).as("mean_luma"),
        round(element_at(col("feature"), 1), 6).as("f0"))
      .orderBy(col("media_id"))
  }

  // -------------------------------------------------------------------
  // m62: frame sampling — every k-th fixed-size chunk of the payload as
  // one output row (video → sampled frames). Generator shape: explode
  // over deterministic offsets, no shuffle, frame bytes stay
  // partition-local. The sampled-frame *size* is pure offset arithmetic
  // (last chunk may be short), so the oracle needs no BLOB slicing —
  // DuckDB has no substring(BLOB). Fully SQL-expressible → oracle-checked.
  // -------------------------------------------------------------------
  private val FrameBytes = 64
  private val SampleEvery = 4 // keep every 4th frame

  def m62FrameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("meta.format") === "mp4")
      .withColumn("n_frames_payload",
        ceil(octet_length(col("media")) / lit(FrameBytes.toDouble)).cast(IntegerType))
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames_payload") - 1)).as("frame_no"),
        octet_length(col("media")).as("payload_bytes"))
      .filter(col("frame_no") % SampleEvery === 0)
      .select(col("media_id"), col("frame_no"),
        least(lit(FrameBytes), col("payload_bytes") - col("frame_no") * FrameBytes)
          .as("frame_bytes"))
      .orderBy(col("media_id"), col("frame_no"))

  val m62FrameSampleSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, octet_length(encode(text)) AS payload_bytes
       |  FROM documents
       |  WHERE ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] = 'mp4'),
       |frames AS (
       |  SELECT media_id, unnest(range(0,
       |    CAST(ceil(payload_bytes / $FrameBytes.0) AS INT))) AS frame_no,
       |    payload_bytes
       |  FROM media)
       |SELECT media_id, frame_no,
       |  least($FrameBytes, payload_bytes - frame_no * $FrameBytes) AS frame_bytes
       |FROM frames
       |WHERE frame_no % $SampleEvery = 0
       |ORDER BY media_id, frame_no""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("m60_media_catalog", m60MediaCatalog _, m60MediaCatalogSql),
    QueryDef.rowsOnly("m61_decode_features", m61DecodeFeatures _),
    QueryDef.sql("m62_frame_sample", m62FrameSample _, m62FrameSampleSql),
  )
}
