package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.operators.Checkpoints.GraftCheckpointOps

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

  /** Typed metadata carried beside the opaque payload. `n_bytes` is the
    * payload size recorded at WRITE time: catalog queries aggregate it from
    * the metadata struct so they never touch the payload column.
    */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_bytes", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("meta", mediaMetaType),
    StructField("media", BinaryType)))

  final case class MediaMeta(format: String, width: Int, height: Int,
                             sample_rate: Int, n_frames: Int, n_bytes: Int)
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

    /** STUB feature extractor: 16 positional byte-histogram moments.
      * All accumulation is exact integer arithmetic; only the final
      * normalization touches floating point (two IEEE double ops, then one
      * float cast) — so the value is bit-deterministic regardless of
      * evaluation order AND expressible in any engine's SQL, which is what
      * lets m61 ride the hash-grade oracle gate.
      */
    def features(bytes: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        sums(i % FeatureDim) += (bytes(i) & 0xff)
        i += 1
      }
      val n = math.max(1, bytes.length / FeatureDim)
      Array.tabulate(FeatureDim)(j => ((sums(j) / 255.0) / n).toFloat)
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
          (col("n_chars") % 16 + 1).cast(IntegerType).as("n_frames"),
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"),
        encode(col("text"), "UTF-8").as("media"))

  // -------------------------------------------------------------------
  // m60: media catalog scan — metadata-only query over the media table.
  // Payload-free: total_bytes aggregates meta.n_bytes (recorded at write
  // time), never octet_length(media) — at 100 TB a catalog query that
  // scans payloads re-reads the whole lake; this one reads the (tiny)
  // metadata struct only, and MultimodalSpec pins that the parquet scan
  // schema excludes `media`.
  // -------------------------------------------------------------------
  /** Catalog aggregation over any media-shaped frame (meta struct per
    * [[mediaMetaType]]). Touches only `meta.*` columns.
    */
  def mediaCatalog(media: DataFrame): DataFrame =
    media
      .groupBy(col("meta.format").as("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        avg(col("meta.width")).as("avg_width"),
        max(col("meta.n_frames")).as("max_frames"))
      .orderBy(col("format"))

  def m60MediaCatalog(spark: SparkSession, dir: String): DataFrame =
    mediaCatalog(mediaTable(spark, dir))

  val m60MediaCatalogSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
      |    (n_chars % 64 + 1)::INT AS width,
      |    (n_chars % 16 + 1)::INT AS n_frames,
      |    octet_length(encode(text)) AS n_bytes
      |  FROM documents)
      |SELECT format, COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  AVG(width) AS avg_width,
      |  MAX(n_frames) AS max_frames
      |FROM media
      |GROUP BY format
      |ORDER BY format""".stripMargin

  // -------------------------------------------------------------------
  // m61: batch decode + feature extraction — typed mapPartitions, one
  // codec context per partition, streaming iterator. The stub codec's
  // outputs are exact-integer-derived (see FakeCodec), so the query is
  // hash-grade oracle-checked: DuckDB recomputes the byte sums from the
  // text (the payload IS utf-8 text, and the corpus is all-ASCII — byte
  // value == codepoint, which MultimodalSpec asserts as a precondition).
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
        // both outputs are exact: mean_luma is one IEEE division of exact
        // integers; f0 is (int / 255.0) / int cast through float32 — no
        // accumulation-order dependence, no rounding needed
        col("mean_luma"),
        element_at(col("feature"), 1).cast(DoubleType).as("f0"))
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of [[FakeCodec]] over the utf-8 payload: byte codes
    * via `unicode(substr(text, i, 1))` (valid because the corpus is
    * ASCII), slot-0 positions = 1, 17, 33, … (range step 16), and the
    * same two-division-then-float32 normalization as `features`.
    */
  val m61DecodeFeaturesSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id,
       |    ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
       |    text, octet_length(encode(text)) AS n_bytes
       |  FROM documents),
       |sums AS (
       |  SELECT media_id, format, n_bytes,
       |    COALESCE(list_sum(list_transform(range(1, len(text) + 1),
       |      i -> unicode(substr(text, i, 1)))), 0) AS luma_sum,
       |    COALESCE(list_sum(list_transform(range(1, len(text) + 1, ${FakeCodec.FeatureDim}),
       |      i -> unicode(substr(text, i, 1)))), 0) AS s0
       |  FROM media)
       |SELECT media_id, format, n_bytes,
       |  CASE WHEN n_bytes = 0 THEN 0.0
       |       ELSE CAST(luma_sum AS DOUBLE) / n_bytes END AS mean_luma,
       |  CAST(CAST((s0 / 255.0) / greatest(1, n_bytes // ${FakeCodec.FeatureDim}) AS REAL)
       |       AS DOUBLE) AS f0
       |FROM sums
       |ORDER BY media_id""".stripMargin

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

  // -------------------------------------------------------------------
  // m63: audio frame energy + voice-activity gate — the audio-side
  // sibling of m62's video frame sampling: window the waveform into
  // fixed 160-sample frames (10 ms at the catalog's 16 kHz), compute
  // per-frame energy, and gate frames against a threshold (the classic
  // energy VAD front-end before any ASR/codec stage). The decode step
  // rides the same deterministic FakeCodec stand-in as m61 (payload
  // bytes AS samples, centered at 'm' = 109); energy is an exact
  // integer sum of squares, so the oracle mirrors it bit-for-bit from
  // the text payload. Plumbing is the real thing: posexplode fans the
  // payload into (sample index, sample), two hash aggregates fold
  // frames then media — sample fan-out shuffles once on (media_id,
  // frame), and the per-media output is O(catalog size).
  // -------------------------------------------------------------------
  private val VadFrameLen = 160
  private val VadThreshold = 160000L

  def m63AudioVad(spark: SparkSession, dir: String): DataFrame = {
    val frames = mediaTable(spark, dir)
      .where(col("meta.format") === "wav")
      .select(col("media_id"), posexplode(split(decode(col("media"), "UTF-8"), "")))
      // Java's split(regex, -1) can emit a trailing "" element that
      // DuckDB's string_split(text, '') never produces — drop it before
      // the frame math so both engines see the same sample stream.
      .where(col("col") =!= "")
      .select(col("media_id"), expr(s"pos div $VadFrameLen").cast(LongType).as("frame"),
        (ascii(col("col")) - lit(109)).as("s"))
      .groupBy(col("media_id"), col("frame"))
      .agg(sum((col("s") * col("s")).cast(LongType)).as("energy"))
    frames
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("energy") > VadThreshold, 1L).otherwise(0L)).as("n_voiced"),
        min(when(col("energy") > VadThreshold, col("frame"))).as("first_voiced"),
        max(col("energy")).as("max_energy"))
      .orderBy(col("media_id"))
  }

  val m63AudioVadSql: String =
    s"""WITH wav AS (
       |  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 4 = 2),
       |ch AS (
       |  SELECT media_id, unnest(string_split(text, '')) AS c,
       |    generate_subscripts(string_split(text, ''), 1) AS i
       |  FROM wav),
       |fr AS (
       |  SELECT media_id, (i - 1) // $VadFrameLen AS frame,
       |    CAST(SUM((ascii(c) - 109) * (ascii(c) - 109)) AS BIGINT) AS energy
       |  FROM ch GROUP BY media_id, (i - 1) // $VadFrameLen)
       |SELECT media_id, COUNT(*) AS n_frames,
       |  CAST(SUM(CASE WHEN energy > $VadThreshold THEN 1 ELSE 0 END) AS BIGINT) AS n_voiced,
       |  CAST(MIN(CASE WHEN energy > $VadThreshold THEN frame END) AS BIGINT) AS first_voiced,
       |  MAX(energy) AS max_energy
       |FROM fr GROUP BY media_id ORDER BY media_id""".stripMargin

  // -------------------------------------------------------------------
  // m68: audio loudness / clipping audit — the waveform-quality gate a
  // speech-data pipeline applies before transcription: per clip, sample
  // count, duration, peak amplitude, clipped-sample count (|s| ≥ 70 on
  // the FakeCodec scale — spaces decode to −77, the corpus's genuine
  // spike class) and RMS level. Everything upstream of RMS is exact
  // integer arithmetic off ONE sample fan-out + one hash aggregate; RMS
  // is division-then-sqrt on exact-integer operands, both correctly
  // rounded IEEE ops, identical in both engines.
  // -------------------------------------------------------------------
  private val ClipBar = 70L
  private val SampleRate = 16000.0

  def m68LoudnessAudit(spark: SparkSession, dir: String): DataFrame = {
    val s = mediaTable(spark, dir)
      .where(col("meta.format") === "wav")
      .select(col("media_id"), posexplode(split(decode(col("media"), "UTF-8"), "")))
      .where(col("col") =!= "")
      .select(col("media_id"), (ascii(col("col")) - lit(109)).cast(LongType).as("s"))
    s.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_samples"),
        max(abs(col("s"))).as("peak"),
        sum(when(abs(col("s")) >= ClipBar, 1L).otherwise(0L)).as("n_clipped"),
        sum(col("s") * col("s")).as("energy"))
      .select(col("media_id"), col("n_samples"),
        (col("n_samples").cast(DoubleType) / lit(SampleRate)).as("duration_s"),
        col("peak"), col("n_clipped"),
        sqrt(col("energy").cast(DoubleType) / col("n_samples").cast(DoubleType))
          .as("rms"))
      .orderBy(col("media_id"))
  }

  val m68LoudnessAuditSql: String =
    s"""WITH wav AS (
       |  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 4 = 2),
       |ch AS (
       |  SELECT media_id,
       |    CAST(ascii(unnest(string_split(text, ''))) - 109 AS BIGINT) AS s
       |  FROM wav),
       |agg AS (
       |  SELECT media_id, COUNT(*) AS n_samples,
       |    MAX(abs(s)) AS peak,
       |    CAST(SUM(CASE WHEN abs(s) >= $ClipBar THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_clipped,
       |    CAST(SUM(s * s) AS BIGINT) AS energy
       |  FROM ch GROUP BY media_id)
       |SELECT media_id, n_samples,
       |  CAST(n_samples AS DOUBLE) / $SampleRate AS duration_s,
       |  peak, n_clipped,
       |  sqrt(CAST(energy AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms
       |FROM agg
       |ORDER BY media_id""".stripMargin

  // -------------------------------------------------------------------
  // m64: perceptual-hash (aHash) near-dup candidates over the image
  // rows — the visual-dedup front-end: average-hash the decoded luma
  // into a 64-bit signature (8×8 mean grid), generate candidate pairs
  // by 4×16-bit band collision (the SimHash/pigeonhole trick from d43 —
  // a pair within hamming ≤ 3 per band MUST share a band), and report
  // each candidate's exact hamming distance.
  //
  // Everything is exact integer arithmetic: cell/global mean comparison
  // is cross-multiplied (cs·tl > ts·cl — no division), band values are
  // bit sums < 2^16, and hamming is bit_count(xor) over the four bands
  // in both engines. The luma "decode" rides FakeCodec's byte
  // interpretation, same as m61/m63.
  //
  // No accept threshold is applied: this corpus's fake images are text
  // payloads with near-uniform 64-cell profiles, so banding yields
  // candidates whose hamming sits well above a strict visual-dup bar —
  // MultimodalSpec asserts that (the report is honest, not vacuously
  // passing) and pins the pigeonhole guarantee on planted twins.
  // Scale: band join is an equi-join on (band, value) — never all
  // pairs; signatures are 4 longs per image.
  // -------------------------------------------------------------------
  def m64PhashCandidates(spark: SparkSession, dir: String): DataFrame =
    phashCandidatesFrom(mediaTable(spark, dir)
      .where(col("meta.format").isin("png", "jpeg"))
      .select(col("media_id"), decode(col("media"), "UTF-8").as("text")))

  /** The aHash signature stage over an (media_id, text) luma table:
    * (media_id, band, bv) — 4 rows of a 16-bit band value per image.
    * Split out so [[incrementalPhashClusters]] can band each batch once
    * against a persisted index (the d63 advance discipline).
    */
  private[graft] def phashBandsFrom(img: DataFrame): DataFrame = {
    val ch = img
      .select(col("media_id"), length(col("text")).as("len"),
        posexplode(split(col("text"), "")))
      .where(col("col") =!= "")
      .select(col("media_id"), col("len"),
        expr("(pos * 64) div len").as("cell"), ascii(col("col")).cast("long").as("v"))
    val cells = ch.groupBy(col("media_id"), col("cell"))
      .agg(sum(col("v")).as("cs"), count(lit(1)).as("cl"))
    val tot = cells.groupBy(col("media_id"))
      .agg(sum(col("cs")).as("ts"), sum(col("cl")).as("tl"))
    val bits = cells.join(tot, "media_id")
      .select(col("media_id"), col("cell"),
        when(col("cs") * col("tl") > col("ts") * col("cl"), 1L).otherwise(0L).as("bit"))
    bits.groupBy(col("media_id"), expr("cell div 16").as("band"))
      .agg(sum(expr("shiftleft(bit, CAST(cell % 16 AS INT))")).as("bv"))
  }

  /** The banding pipeline over an (media_id, text) luma table — split out
    * so specs can plant byte-identical twins and assert the pigeonhole
    * guarantee directly.
    */
  private[graft] def phashCandidatesFrom(img: DataFrame): DataFrame = {
    val bands = phashBandsFrom(img)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    val ba = bands.select(col("media_id").as("ia"), col("band").as("band_a"),
      col("bv").as("bv_a"))
    val bb = bands.select(col("media_id").as("ib"), col("band").as("band_b"),
      col("bv").as("bv_b"))
    cand
      .join(ba, col("id_a") === col("ia"))
      .join(bb, col("id_b") === col("ib") && col("band_b") === col("band_a"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(expr("bit_count(bv_a ^ bv_b)")).cast("long").as("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The aHash → banding → exact-hamming pipeline as reusable CTEs (m64
    * emits it directly; m66 builds the transitive closure on top).
    */
  private val phashCtesSql: String =
    """img AS (
      |  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 4 < 2),
      |ch AS (
      |  SELECT media_id, ascii(unnest(string_split(text, ''))) AS v,
      |    generate_subscripts(string_split(text, ''), 1) - 1 AS i,
      |    length(text) AS len
      |  FROM img),
      |cells AS (
      |  SELECT media_id, (i * 64) // len AS cell,
      |    CAST(SUM(v) AS BIGINT) AS cs, COUNT(*) AS cl
      |  FROM ch GROUP BY media_id, (i * 64) // len),
      |tot AS (SELECT media_id, SUM(cs) AS ts, SUM(cl) AS tl FROM cells GROUP BY media_id),
      |bits AS (
      |  SELECT c.media_id, c.cell,
      |    CAST(CASE WHEN c.cs * t.tl > t.ts * c.cl THEN 1 ELSE 0 END AS BIGINT) AS bit
      |  FROM cells c JOIN tot t ON c.media_id = t.media_id),
      |bands AS (
      |  SELECT media_id, cell // 16 AS band,
      |    CAST(SUM(bit << (cell % 16)) AS BIGINT) AS bv
      |  FROM bits GROUP BY media_id, cell // 16),
      |cand AS (
      |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
      |ph AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(SUM(bit_count(xor(ba.bv, bb.bv))) AS BIGINT) AS hamming
      |  FROM cand c
      |  JOIN bands ba ON ba.media_id = c.id_a
      |  JOIN bands bb ON bb.media_id = c.id_b AND bb.band = ba.band
      |  GROUP BY c.id_a, c.id_b)""".stripMargin

  val m64PhashCandidatesSql: String =
    s"""WITH $phashCtesSql
       |SELECT id_a, id_b, hamming FROM ph
       |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------
  // m65: scene-change detection — the temporal sibling of m62's frame
  // sampling: window the video payload into 64-byte frames, compute
  // per-frame mean luma, and flag frames whose mean shifts more than
  // 10% against the previous frame (the shot-boundary heuristic every
  // video curation pipeline starts from). The mean comparison is
  // cross-multiplied so short trailing frames normalize correctly and
  // no division happens: 10·|luma·prevlen − prev·flen| > prev·flen is
  // |mean − prev_mean| > prev_mean/10 in exact integers. One fan-out,
  // two hash aggregates, one lag window per media — all partition-local
  // after the (media, frame) shuffle.
  // -------------------------------------------------------------------
  /** Per-(video, 64-byte frame) luma sums — the frame table m65 (scene
    * changes) and m67 (keyframe election) both window over.
    */
  private def videoLumaFrames(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .where(col("meta.format") === "mp4")
      .select(col("media_id"), posexplode(split(decode(col("media"), "UTF-8"), "")))
      .where(col("col") =!= "")
      .select(col("media_id"), expr("pos div 64").as("frame"),
        ascii(col("col")).cast("long").as("v"))
      .groupBy(col("media_id"), col("frame"))
      .agg(sum(col("v")).as("luma"), count(lit(1)).as("flen"))

  def m65SceneChanges(spark: SparkSession, dir: String): DataFrame = {
    val frames = videoLumaFrames(spark, dir)
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame"))
    frames
      .withColumn("prev", lag(col("luma"), 1).over(w))
      .withColumn("prevlen", lag(col("flen"), 1).over(w))
      .where(col("prev").isNotNull &&
        abs(col("luma") * col("prevlen") - col("prev") * col("flen")) * lit(10L) >
          col("prev") * col("flen"))
      .select(col("media_id"), col("frame"),
        abs(col("luma") * col("prevlen") - col("prev") * col("flen")).as("delta_x"))
      .orderBy(col("media_id"), col("frame"))
  }

  /** vid/ch/fr CTE block shared by m65 and m67 — DuckDB mirror of
    * [[videoLumaFrames]].
    */
  private val videoFramesCtesSql: String =
    """vid AS (
      |  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 4 = 3),
      |ch AS (
      |  SELECT media_id, ascii(unnest(string_split(text, ''))) AS v,
      |    generate_subscripts(string_split(text, ''), 1) - 1 AS i
      |  FROM vid),
      |fr AS (
      |  SELECT media_id, i // 64 AS frame,
      |    CAST(SUM(v) AS BIGINT) AS luma, COUNT(*) AS flen
      |  FROM ch GROUP BY media_id, i // 64)""".stripMargin

  val m65SceneChangesSql: String =
    s"""WITH $videoFramesCtesSql,
      |d AS (
      |  SELECT media_id, frame, luma, flen,
      |    lag(luma) OVER (PARTITION BY media_id ORDER BY frame) AS prev,
      |    lag(flen) OVER (PARTITION BY media_id ORDER BY frame) AS prevlen
      |  FROM fr)
      |SELECT media_id, frame,
      |  CAST(abs(luma * prevlen - prev * flen) AS BIGINT) AS delta_x
      |FROM d
      |WHERE prev IS NOT NULL
      |  AND abs(luma * prevlen - prev * flen) * 10 > prev * flen
      |ORDER BY media_id, frame""".stripMargin

  // -------------------------------------------------------------------
  // m67: scene segmentation + keyframe election — the step after m65's
  // shot boundaries: number scenes by a running sum of the cut flags
  // (first frame opens scene 1), then elect each scene's keyframe as its
  // brightest frame (max mean luma, earliest frame on ties) — the
  // thumbnail/representative-frame pick a video curation pipeline stores
  // per shot. Cut detection is m65's exact cross-multiplied integer
  // compare; mean luma is ONE IEEE division of exact integers, so the
  // (mean_luma DESC, frame ASC) election is a total order identical in
  // both engines.
  //
  // Scale: the per-media lag/scan windows ride one (media_id) exchange;
  // the per-(media, scene) windows add a second, narrower one — all over
  // the frame table, which is 1/64th of payload bytes, never the corpus.
  // -------------------------------------------------------------------
  def m67Keyframes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame"))
    val flagged = videoLumaFrames(spark, dir)
      .withColumn("prev", lag(col("luma"), 1).over(w))
      .withColumn("prevlen", lag(col("flen"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNull ||
          abs(col("luma") * col("prevlen") - col("prev") * col("flen")) * lit(10L) >
            col("prev") * col("flen"), 1L).otherwise(0L))
      .withColumn("scene",
        sum(col("cut")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("mean_luma",
        col("luma").cast("double") / col("flen").cast("double"))
    val wScene = Window.partitionBy(col("media_id"), col("scene"))
    val wKey = Window.partitionBy(col("media_id"), col("scene"))
      .orderBy(col("mean_luma").desc, col("frame").asc)
    flagged
      .withColumn("start_frame", min(col("frame")).over(wScene))
      .withColumn("end_frame", max(col("frame")).over(wScene))
      .withColumn("n_frames", count(lit(1)).over(wScene))
      .withColumn("krn", row_number().over(wKey))
      .filter(col("krn") === 1)
      .select(col("media_id"), col("scene").as("scene_id"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("frame").as("key_frame"),
        col("mean_luma").as("key_mean_luma"))
      .orderBy(col("media_id"), col("scene_id"))
  }

  val m67KeyframesSql: String =
    s"""WITH $videoFramesCtesSql,
       |d AS (
       |  SELECT media_id, frame, luma, flen,
       |    lag(luma) OVER (PARTITION BY media_id ORDER BY frame) AS prev,
       |    lag(flen) OVER (PARTITION BY media_id ORDER BY frame) AS prevlen
       |  FROM fr),
       |f AS (
       |  SELECT media_id, frame, luma, flen,
       |    CASE WHEN prev IS NULL
       |      OR abs(luma * prevlen - prev * flen) * 10 > prev * flen
       |      THEN 1 ELSE 0 END AS cut
       |  FROM d),
       |s AS (
       |  SELECT media_id, frame,
       |    CAST(SUM(cut) OVER (PARTITION BY media_id ORDER BY frame
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene,
       |    CAST(luma AS DOUBLE) / CAST(flen AS DOUBLE) AS mean_luma
       |  FROM f),
       |k AS (
       |  SELECT media_id, frame, scene, mean_luma,
       |    ROW_NUMBER() OVER (PARTITION BY media_id, scene
       |      ORDER BY mean_luma DESC, frame ASC) AS krn,
       |    MIN(frame) OVER (PARTITION BY media_id, scene) AS start_frame,
       |    MAX(frame) OVER (PARTITION BY media_id, scene) AS end_frame,
       |    CAST(COUNT(*) OVER (PARTITION BY media_id, scene) AS BIGINT) AS n_frames
       |  FROM s)
       |SELECT media_id, scene AS scene_id, start_frame, end_frame, n_frames,
       |  frame AS key_frame, mean_luma AS key_mean_luma
       |FROM k WHERE krn = 1
       |ORDER BY media_id, scene_id""".stripMargin

  // -------------------------------------------------------------------
  // m66: visual near-dup CLUSTERS — the composition that turns m64's
  // candidate pairs into dedup-actionable groups: filter candidates to
  // hamming ≤ 20 (this corpus's fake-luma profiles put true twins well
  // under it and unrelated images well over — MultimodalSpec documents
  // the honest bar), resolve the transitive closure with the SAME
  // min-label-propagation component resolver d45/c70 use, and elect
  // the min-id keeper per cluster. Output is the cluster membership
  // audit: (media_id, cluster_id, n_members, is_keeper).
  //
  // Scale: everything rides m64's band-join candidate generation (never
  // all pairs) + the O(log n)-round pointer-jump closure; the keeper
  // election and sizes are one aggregate over the node-sized membership
  // table. Pure integers end-to-end.
  // -------------------------------------------------------------------
  private val PhashClusterBar = 20L

  def m66PhashClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = m64PhashCandidates(spark, dir)
      .filter(col("hamming") <= PhashClusterBar)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .select(col("doc_id").as("media_id"), col("cluster_id"))
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
    cc.join(sizes, "cluster_id")
      .select(col("media_id"), col("cluster_id"), col("n_members"),
        when(col("media_id") === col("cluster_id"), 1L).otherwise(0L).as("is_keeper"))
      .orderBy(col("media_id"))
  }

  val m66PhashClustersSql: String =
    s"""WITH $phashCtesSql,
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM ph WHERE hamming <= $PhashClusterBar
       |  UNION SELECT id_b, id_a FROM ph WHERE hamming <= $PhashClusterBar),
       |${graft.operators.CcSql.stages()},
       |memb AS (
       |  SELECT id AS media_id, l AS cluster_id
       |  FROM ${graft.operators.CcSql.labels()}),
       |sz AS (SELECT cluster_id, COUNT(*) AS n_members FROM memb GROUP BY cluster_id)
       |SELECT m.media_id, m.cluster_id, sz.n_members,
       |  CAST(CASE WHEN m.media_id = m.cluster_id THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_keeper
       |FROM memb m JOIN sz USING (cluster_id)
       |ORDER BY media_id""".stripMargin

  // -------------------------------------------------------------------
  // m70: incremental visual near-dup against a persisted phash band
  // index — the multimodal sibling of d63 (text MinHash) and d64
  // (embeddings), closing the LAST near-dup family without an
  // incremental story. State between advances: the accumulated
  // (media_id, band, bv) signature index — 4 longs per image, orders
  // smaller than the payload lake — and the accumulated pair list. A
  // new id-monotone media batch is aHash-banded ONCE, collided against
  // the accumulated index on (band, bv), and its pairs' exact hamming
  // comes from the same 4-band rejoin m64 uses; because ids are
  // batch-monotone, every (a < b) pair surfaces exactly when b's batch
  // arrives, so deltas union and the folded clustering equals the
  // from-scratch m66 run — the oracle is m66's SQL VERBATIM over the
  // union (incremental ≡ recompute hash-proven, the d63/d64/c71
  // discipline). Payloads are decoded once, in their own batch; the
  // lake is never re-read.
  // -------------------------------------------------------------------

  /** The fold's between-advance state: the accumulated (media_id, band,
    * bv) signature index and the accumulated pair deltas (final per
    * pair). `null` frames = the empty pre-first-advance state.
    */
  final case class PhashState(index: DataFrame, pairs: DataFrame)

  /** One advance: aHash-band the id-monotone batch ONCE, collide it
    * against the accumulated index on (band, bv), union the pair delta.
    */
  private[graft] def advancePhash(state: PhashState, b: DataFrame,
      bar: Long = PhashClusterBar): PhashState = {
    // band the newcomers once; constraint-shedding checkpoint (the
    // state frame is unioned and triple-joined across advances)
    val newBands = Checkpoints.fresh(phashBandsFrom(b), "media_id", "band", "bv")
    val all = if (state.index == null) newBands
      else state.index.unionByName(newBands)
    val cand = all.as("a").join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    val ba = all.select(col("media_id").as("ia"), col("band").as("band_a"),
      col("bv").as("bv_a"))
    val bb = all.select(col("media_id").as("ib"), col("band").as("band_b"),
      col("bv").as("bv_b"))
    val delta = cand
      .join(ba, col("id_a") === col("ia"))
      .join(bb, col("id_b") === col("ib") && col("band_b") === col("band_a"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(expr("bit_count(bv_a ^ bv_b)")).cast("long").as("hamming"))
      .filter(col("hamming") <= bar)
      .select(col("id_a"), col("id_b"))
    val pairs = if (state.pairs == null) Checkpoints.fresh(delta, "id_a", "id_b")
      else Checkpoints.fresh(state.pairs.unionByName(delta), "id_a", "id_b")
    PhashState(all.graftCheckpoint(true), pairs)
  }

  /** m66's cluster-membership shape for everything folded so far. */
  private[graft] def phashClustersOf(state: PhashState): DataFrame = {
    val cc = Dedup.connectedComponents(state.pairs, "id_a", "id_b")
      .select(col("doc_id").as("media_id"), col("cluster_id"))
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
    cc.join(sizes, "cluster_id")
      .select(col("media_id"), col("cluster_id"), col("n_members"),
        when(col("media_id") === col("cluster_id"), 1L).otherwise(0L).as("is_keeper"))
      .orderBy(col("media_id"))
  }

  /** Fold id-monotone (media_id, text) luma batches through a persisted
    * band index; ≡ [[m66PhashClusters]] of the batches' union.
    */
  private[graft] def incrementalPhashClusters(batches: Seq[DataFrame],
      bar: Long = PhashClusterBar): DataFrame =
    phashClustersOf(batches.foldLeft(PhashState(null, null))(advancePhash(_, _, bar)))

  def m70IncrementalPhash(spark: SparkSession, dir: String): DataFrame = {
    val img = mediaTable(spark, dir)
      .where(col("meta.format").isin("png", "jpeg"))
      .select(col("media_id"), decode(col("media"), "UTF-8").as("text"))
    incrementalPhashClusters(Increments.monotoneHalves(img, "media_id"))
  }

  // -------------------------------------------------------------------
  // m71: the phash fold RESUMED FROM DISK — m70's operator promoted to
  // a pipeline (VERDICT r14 item 1, visual path): the 4-longs-per-image
  // band index and the pair list persist as parquet between runs; each
  // run loads them, folds the night's decoded batch, writes the
  // advanced state back — the payload lake is never re-read. Oracle is
  // STILL m66's SQL verbatim over the union (pure-integer pipeline, so
  // the durability boundary cannot even introduce FP noise).
  // -------------------------------------------------------------------

  private[graft] def savePhashState(state: PhashState, path: String): Unit =
    Increments.saveState(path,
      "phash_index" -> state.index, "pairs" -> state.pairs)

  private[graft] def loadPhashState(spark: SparkSession, path: String): PhashState =
    PhashState(
      Increments.loadState(spark, path, "phash_index", "media_id", "band", "bv"),
      Increments.loadState(spark, path, "pairs", "id_a", "id_b"))

  def m71ResumedPhash(spark: SparkSession, dir: String): DataFrame = {
    val img = mediaTable(spark, dir)
      .where(col("meta.format").isin("png", "jpeg"))
      .select(col("media_id"), decode(col("media"), "UTF-8").as("text"))
    val batches = Increments.monotoneHalves(img, "media_id")
    val stateDir = java.nio.file.Files.createTempDirectory("graft_m71_state").toString
    try {
      // run 1: fold batch 1 from empty state, persist, forget
      savePhashState(advancePhash(PhashState(null, null), batches.head), stateDir)
      // run 2: the resumed fold sees ONLY the disk state
      val resumed = batches.tail.foldLeft(loadPhashState(spark, stateDir))(
        advancePhash(_, _))
      savePhashState(resumed, stateDir) // the nightly write-back
      phashClustersOf(resumed)
    } finally Increments.deleteRecursively(stateDir)
  }

  // -------------------------------------------------------------------
  // m69: caption↔frame alignment — for every sampled video frame (m62's
  // 25 fps grid), the transcript caption active at that instant: the
  // LATEST caption whose start time is ≤ the frame timestamp. This is
  // the point-in-time join every interleaved vision-text training
  // pipeline runs to pair frames with text, and it rides the engine's
  // as-of operator ([[AsOfJoin.asOf]]): union + one ordered window scan
  // per media key — O(rows), never the quadratic
  // every-frame × every-earlier-caption candidate blow-up. Caption
  // track is derived deterministically from the payload (one caption
  // per 75-byte transcript chunk, 130 ms cadence, deliberately coprime
  // with the 40 ms frame step so alignment is non-trivial); both
  // tracks' (media_id, ts) are unique by construction, the as-of
  // operator's determinism precondition. Frame 0 always matches
  // caption 0 (inclusive bound) — no null track.
  // -------------------------------------------------------------------
  private val CapBytes = 75
  private val FrameStepMs = 40L // 25 fps
  private val CapStepMs = 130L

  def m69CaptionAlign(spark: SparkSession, dir: String): DataFrame = {
    val mp4 = mediaTable(spark, dir)
      .filter(col("meta.format") === "mp4")
      .select(col("media_id"), octet_length(col("media")).as("pb"))
    val frames = mp4
      .select(col("media_id"), explode(sequence(lit(0),
        ceil(col("pb") / lit(FrameBytes.toDouble)).cast(IntegerType) - 1)).as("frame_no"))
      .filter(col("frame_no") % SampleEvery === 0)
      .select(col("media_id"), col("frame_no"),
        (col("frame_no").cast(LongType) * FrameStepMs).as("ts"))
    val caps = mp4
      .select(col("media_id"), explode(sequence(lit(0),
        ceil(col("pb") / lit(CapBytes.toDouble)).cast(IntegerType) - 1)).as("cap_no"))
      .select(col("media_id"), (col("cap_no").cast(LongType) * CapStepMs).as("ts"),
        col("cap_no"))
    AsOfJoin.asOf(frames, caps, "media_id", "ts")
      .select(col("media_id"), col("frame_no"), col("ts").as("frame_ms"),
        col("cap_no"),
        (col("ts") - col("cap_no").cast(LongType) * CapStepMs).as("lag_ms"))
      .orderBy(col("media_id"), col("frame_no"))
  }

  val m69CaptionAlignSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, octet_length(encode(text)) AS pb
       |  FROM documents
       |  WHERE ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] = 'mp4'),
       |frames AS (
       |  SELECT media_id, frame_no, frame_no * $FrameStepMs AS ts
       |  FROM (
       |    SELECT media_id,
       |      unnest(range(0, CAST(ceil(pb / $FrameBytes.0) AS INT))) AS frame_no
       |    FROM media)
       |  WHERE frame_no % $SampleEvery = 0),
       |caps AS (
       |  SELECT media_id, cap_no, cap_no * $CapStepMs AS ts
       |  FROM (
       |    SELECT media_id,
       |      unnest(range(0, CAST(ceil(pb / $CapBytes.0) AS INT))) AS cap_no
       |    FROM media))
       |SELECT f.media_id, f.frame_no, f.ts AS frame_ms, c.cap_no,
       |  f.ts - c.cap_no * $CapStepMs AS lag_ms
       |FROM frames f ASOF JOIN caps c
       |  ON f.media_id = c.media_id AND f.ts >= c.ts
       |ORDER BY f.media_id, f.frame_no""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("m60_media_catalog", m60MediaCatalog _, m60MediaCatalogSql),
    QueryDef.sql("m69_caption_align", m69CaptionAlign _, m69CaptionAlignSql),
    QueryDef.sql("m61_decode_features", m61DecodeFeatures _, m61DecodeFeaturesSql),
    QueryDef.sql("m62_frame_sample", m62FrameSample _, m62FrameSampleSql),
    QueryDef.sql("m63_audio_vad", m63AudioVad _, m63AudioVadSql),
    QueryDef.sql("m64_phash_candidates", m64PhashCandidates _, m64PhashCandidatesSql),
    QueryDef.sql("m65_scene_changes", m65SceneChanges _, m65SceneChangesSql),
    QueryDef.sql("m66_phash_clusters", m66PhashClusters _, m66PhashClustersSql),
    // incremental ≡ recompute: m70's oracle is m66's SQL verbatim;
    // m71 resumes the fold from parquet state under the same oracle
    QueryDef.sql("m70_incremental_phash", m70IncrementalPhash _, m66PhashClustersSql),
    QueryDef.sql("m71_resumed_phash", m71ResumedPhash _, m66PhashClustersSql),
    QueryDef.sql("m67_keyframes", m67Keyframes _, m67KeyframesSql),
    QueryDef.sql("m68_loudness_audit", m68LoudnessAudit _, m68LoudnessAuditSql),
  )
}
