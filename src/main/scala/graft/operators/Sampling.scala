package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.{QueryDef, Tables}
import graft.operators.Checkpoints.GraftCheckpointOps

/** Deterministic stratified sampling over `documents` — the
  * training-data downsampling primitive (fix a per-language quota, keep
  * a reproducible pseudo-random subset). "Random" = md5-hash order
  * ([[PortableHash.h60]]), so the sample is a pure function of the data
  * — re-runs, engine swaps, and partitioning changes all return the
  * same rows, which is what dataset versioning at 100 TB needs.
  *
  * Scale shape (d46): the naive formulation ranks EVERY row per stratum
  * (full sort of each stratum behind one window). Instead, phase 1
  * prefilters each stratum by hash threshold targeting Over×K survivors
  * (the q34 centroid-threshold arithmetic, exact integers both
  * engines), so the rank window in phase 2 sorts only ~Over×K rows per
  * stratum instead of n. The per-stratum counts that size the
  * thresholds come from a driver-side collect of a |strata|-row
  * aggregate — strata cardinality (languages, domains) is small by
  * definition; the corpus itself never leaves the executors. With
  * Binomial(n, Over·K/n) survivors, P(fewer than K) is negligible for
  * Over = 4 (mean 4K, sd ~2√K); the spec pins exactly-K output.
  */
object Sampling {

  private val K = 50
  private val Over = 4

  /** Per-stratum hash threshold: floor(2^60 · min(1, Over·K/n)). */
  private[operators] def sampleThreshold(n: Long): Long = {
    require(n > 0)
    (PortableHash.HashSpace.min(
      PortableHash.HashSpace * (Over.toLong * K) / n)).toLong
  }

  def d46StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    // |strata| rows only — the corpus-scale data stays distributed
    val thresholds = d.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), sampleThreshold(r.getLong(1)))).toSeq
    val tDf = spark.createDataFrame(thresholds).toDF("lang", "t")
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    d.join(broadcast(tDf), "lang")
      .withColumn("h", PortableHash.h60(col("doc_id")))
      .filter(col("h") < col("t"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("lang"), col("rank"), col("doc_id"))
      .orderBy(col("lang"), col("rank"))
  }

  val d46StratifiedSampleSql: String =
    s"""WITH n AS (
       |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
       |t AS (
       |  SELECT lang, CAST(LEAST(
       |      ${PortableHash.HashSpaceSqlHugeInt},
       |      ${PortableHash.HashSpaceSqlHugeInt} * ${Over * K} / n) AS BIGINT) AS t
       |  FROM n),
       |f AS (
       |  SELECT d.lang, d.doc_id, ${PortableHash.h60Sql("d.doc_id")} AS h
       |  FROM documents d JOIN t USING (lang)
       |  WHERE ${PortableHash.h60Sql("d.doc_id")} < t.t),
       |r AS (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
       |  FROM f)
       |SELECT lang, rank, doc_id
       |FROM r WHERE rank <= $K
       |ORDER BY lang, rank""".stripMargin

  // -------------------------------------------------------------------
  // d51: weighted systematic sampling — per source stratum, pick
  // SampleK documents with probability proportional to size (n_chars),
  // the standard PPS scheme for token-budgeted corpus mixing (a 10k-char
  // doc should be 10× likelier in the sample than a 1k-char one).
  //
  // Systematic PPS: lay every doc of a stratum on a weight line in
  // doc_id order (exact BIGINT prefix sums), then take the k midpoints
  // p_j = (2j+1)·W/(2k); a doc is picked once per midpoint inside its
  // [prev, cum) weight interval. Every quantity is integer — the pick
  // count per doc is f(cum) − f(prev) with
  //   f(x) = 0                          if 2k·x ≤ W
  //        = (2k·x − W + 2W − 1) div 2W  otherwise  (= #{j : p_j < x})
  // so both engines agree bit-for-bit with NO floating point and no RNG:
  // the sample is a pure function of the data, like d46.
  //
  // Scale: two windows partitioned by source (prefix sum + stratum
  // total), the t57 shape — no global sort, no collect; a stratum's rows
  // stream through one partition's sort, and the output is ≤ k rows per
  // stratum. Unlike d46's uniform hash-threshold sample this one needs
  // the prefix sum, which is exactly what "weighted without replacement"
  // costs; k and the stratum count stay fixed as the corpus grows.
  // -------------------------------------------------------------------
  private val SampleK = 10

  def d51WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    def f(x: String): String =
      s"CASE WHEN ${2 * SampleK} * $x <= w THEN 0 " +
        s"ELSE (${2 * SampleK} * $x - w + 2 * w - 1) div (2 * w) END"
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(wOrd))
      .withColumn("w", sum(col("n_chars")).over(wAll))
      .withColumn("prev", col("cum") - col("n_chars"))
      .withColumn("first_pick", expr(f("prev")))
      .withColumn("n_picks", expr(f("cum")) - expr(f("prev")))
      .filter(col("n_picks") > 0)
      .select(col("source"), col("first_pick"), col("n_picks"),
        col("doc_id"), col("n_chars"), col("cum"), col("w"))
      .orderBy(col("source"), col("first_pick"))
  }

  val d51WeightedSampleSql: String = {
    def f(x: String): String =
      s"CASE WHEN ${2 * SampleK} * ($x) <= w THEN 0 " +
        s"ELSE (${2 * SampleK} * ($x) - w + 2 * w - 1) // (2 * w) END"
    s"""WITH lined AS (
       |  SELECT source, doc_id, n_chars,
       |    CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT) AS w
       |  FROM documents),
       |picked AS (
       |  SELECT source, doc_id, n_chars, cum, w,
       |    ${f("cum - n_chars")} AS first_pick,
       |    ${f("cum")} - ${f("cum - n_chars")} AS n_picks
       |  FROM lined)
       |SELECT source, first_pick, n_picks, doc_id, n_chars, cum, w
       |FROM picked WHERE n_picks > 0
       |ORDER BY source, first_pick""".stripMargin
  }

  // -------------------------------------------------------------------
  // d52: mixture resampling — allocate a GLOBAL document budget across
  // source domains by target weight, then deterministically sample each
  // domain's quota. This is the data-mixing step of corpus assembly
  // ("webtext 40%, code 30%, …"): d46 fixes a per-stratum K; here the
  // per-stratum quota is itself computed, by exact integer largest-
  // remainder apportionment (floor allocation + the leftover seats to
  // the largest remainders, ties by source name), so quotas always sum
  // to the budget and both engines agree bit-for-bit — no floating-
  // point shares anywhere.
  //
  // Scale shape: the allocation runs on the |sources|-row count
  // aggregate (unpartitioned windows over a handful of rows — the
  // corpus never passes through them); selection reuses d46's two-phase
  // hash-threshold prefilter so the per-stratum rank window sorts only
  // ~Over·quota survivors, never the stratum. The threshold compare is
  // cross-multiplied (h·n < 2^60·Over·quota) in DECIMAL(38)/HUGEINT, so
  // no overflow and no division-order ambiguity. If the prefilter ever
  // left fewer than quota survivors, BOTH engines would see the same
  // deficit (the sample is a pure function of the data) — the oracle
  // still matches; MixtureSpec pins exact-quota output on the testdata.
  //
  // Target weights derive deterministically from the source name
  // (w = 1 + srcnum mod 4) — standing in for the config a real mixing
  // job reads; the budget 203 is deliberately not a multiple of the
  // weight total so the remainder distribution is actually exercised.
  // -------------------------------------------------------------------
  private val MixBudget = 203L

  def d52MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    // |sources|-row allocation table; unpartitioned windows are fine here
    val wN = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.orderBy(col("rem").desc, col("source").asc)
    val alloc = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("tw", lit(1L) + expr("CAST(substring(source, 4) AS BIGINT) % 4"))
      .withColumn("wsum", sum(col("tw")).over(wN))
      .withColumn("base", expr(s"($MixBudget * tw) div wsum"))
      .withColumn("rem", expr(s"($MixBudget * tw) % wsum"))
      .withColumn("leftover", lit(MixBudget) - sum(col("base")).over(wN))
      .withColumn("seat", row_number().over(wRem))
      .withColumn("quota", least(col("base") +
        when(col("seat") <= col("leftover"), 1L).otherwise(0L), col("n")))
      .select(col("source"), col("n"), col("quota"))
    // d46's two-phase selection, with the threshold compare cross-
    // multiplied so it stays exact at any n: keep h·n < 2^60·Over·quota
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    d.join(broadcast(alloc), "source")
      .withColumn("h", PortableHash.h60(col("doc_id")))
      .filter(col("h").cast(dec) * col("n").cast(dec) <
        lit(PortableHash.HashSpace.toLong).cast(dec) * (lit(Over.toLong) * col("quota")).cast(dec))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= col("quota"))
      .select(col("source"), col("quota"), col("rank"), col("doc_id"))
      .orderBy(col("source"), col("rank"))
  }

  val d52MixtureSampleSql: String =
    s"""WITH n AS (
       |  SELECT source, COUNT(*) AS n,
       |    1 + CAST(substr(source, 4) AS BIGINT) % 4 AS tw
       |  FROM documents GROUP BY source),
       |a AS (
       |  SELECT source, n, tw,
       |    SUM(tw) OVER () AS wsum,
       |    ($MixBudget * tw) // SUM(tw) OVER () AS base,
       |    ($MixBudget * tw) % SUM(tw) OVER () AS rem
       |  FROM n),
       |q AS (
       |  SELECT source, n,
       |    LEAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
       |      <= $MixBudget - SUM(base) OVER () THEN 1 ELSE 0 END, n) AS quota
       |  FROM a),
       |f AS (
       |  SELECT d.source, q.quota, d.doc_id, ${PortableHash.h60Sql("d.doc_id")} AS h
       |  FROM documents d JOIN q USING (source)
       |  WHERE CAST(${PortableHash.h60Sql("d.doc_id")} AS HUGEINT) * q.n
       |    < ${PortableHash.HashSpaceSqlHugeInt} * ($Over * q.quota)),
       |r AS (
       |  SELECT source, quota, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rank
       |  FROM f)
       |SELECT source, CAST(quota AS BIGINT) AS quota, rank, doc_id
       |FROM r WHERE rank <= quota
       |ORDER BY source, rank""".stripMargin

  // ---------------------------------------------------------------------
  // d56: deterministic train/val/test split assignment — the dataset-
  // versioning primitive every training run starts from. Each doc's
  // split is a pure function of its id (h60 threshold cut at 80%/90% of
  // the 2^60 hash space — exact integer constants, no floats, no RNG),
  // so the assignment is reproducible across engines, re-runs, and
  // repartitions, and any two pipelines that agree on doc_id agree on
  // the split. Output is the per-(source, split) audit table: one scan,
  // one hash aggregate, no shuffle beyond it — the corpus itself never
  // moves. The leakage check (a doc in exactly one split) is free: the
  // thresholds partition the hash space by construction, and the spec
  // re-derives membership independently.
  // ---------------------------------------------------------------------
  private[operators] val TrainBound: Long = (PortableHash.HashSpace * 8 / 10).toLong
  private[operators] val ValBound: Long = (PortableHash.HashSpace * 9 / 10).toLong

  def d56SplitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", PortableHash.h60(col("doc_id")))
      .withColumn("split",
        when(col("h") < TrainBound, "train")
          .when(col("h") < ValBound, "val")
          .otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("source"), col("split"))

  val d56SplitAssignSql: String =
    s"""SELECT source,
       |  CASE WHEN ${PortableHash.h60Sql("doc_id")} < $TrainBound THEN 'train'
       |       WHEN ${PortableHash.h60Sql("doc_id")} < $ValBound THEN 'val'
       |       ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |FROM documents
       |GROUP BY 1, 2
       |ORDER BY source, split""".stripMargin

  // ---------------------------------------------------------------------
  // t73/t74: deterministic corpus shuffle-shard — training-order
  // randomization, the step t57's packing feeds: every epoch-0 data
  // loader wants the corpus in a reproducible pseudo-random order, cut
  // into K equal shards it can hand to K workers.
  //
  // "Random" = the engine's portable hash gadget over (doc_id, seed) —
  // the shuffle is a pure function of (data, seed): re-runs, engine
  // swaps, and partitioning changes reproduce the same permutation, and
  // changing the seed is a fresh epoch order. The position comes from
  // `rankByRange` (range-partitioned slices + broadcast offsets), NOT an
  // unpartitioned row_number — the q83/q94 discipline — and the shard is
  // pure integer arithmetic on that exact rank: (pos-1)·K div n, so
  // shard sizes differ by at most one by construction.
  //
  // t74 is the per-shard MANIFEST the loader actually reads: exact
  // [pos_lo, pos_hi] row ranges plus a bit_xor membership checksum — K
  // rows regardless of corpus size. Scale: one scan, one range exchange;
  // the manifest aggregate is map-side combined into K groups.
  // ---------------------------------------------------------------------
  private[operators] val ShuffleSeed = 42
  private[operators] val ShuffleShards = 8

  /** (doc_id, shuffle_pos, shard) for every document — shared by t73
    * (the permutation itself) and t74 (its manifest).
    */
  private def shardAssign(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        PortableHash.h60(concat_ws(":", col("doc_id"), lit(ShuffleSeed))).as("__key"))
    Relational.rankByRange(keyed, Nil,
        Seq(col("__key").asc, col("doc_id").asc), "shuffle_pos", "__n")
      .select(col("doc_id"), col("shuffle_pos"),
        expr(s"(shuffle_pos - 1) * $ShuffleShards div __n").as("shard"))
  }

  def t73ShuffleShard(spark: SparkSession, dir: String): DataFrame =
    shardAssign(spark, dir).orderBy(col("shuffle_pos"))

  /** The hash-order CTE both oracles share. */
  private val shardAssignSql: String =
    s"""k AS (
       |  SELECT doc_id,
       |    ${PortableHash.h60Sql(s"doc_id || ':$ShuffleSeed'")} AS key
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY key, doc_id) AS shuffle_pos,
       |    COUNT(*) OVER () AS n
       |  FROM k),
       |a AS (
       |  SELECT doc_id, CAST(shuffle_pos AS BIGINT) AS shuffle_pos,
       |    CAST((shuffle_pos - 1) * $ShuffleShards // n AS BIGINT) AS shard
       |  FROM r)""".stripMargin

  val t73ShuffleShardSql: String =
    s"""WITH $shardAssignSql
       |SELECT doc_id, shuffle_pos, shard FROM a
       |ORDER BY shuffle_pos""".stripMargin

  def t74ShardManifest(spark: SparkSession, dir: String): DataFrame =
    shardAssign(spark, dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("shuffle_pos")).as("pos_lo"),
        max(col("shuffle_pos")).as("pos_hi"),
        expr("bit_xor(doc_id)").as("doc_xor"))
      .orderBy(col("shard"))

  val t74ShardManifestSql: String =
    s"""WITH $shardAssignSql
       |SELECT shard, COUNT(*) AS n_docs,
       |  MIN(shuffle_pos) AS pos_lo, MAX(shuffle_pos) AS pos_hi,
       |  BIT_XOR(doc_id) AS doc_xor
       |FROM a
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // d59: DSIR importance-weighted data selection (Xie et al. 2023, "Data
  // Selection for Language Models via Importance Resampling"). Select
  // raw-corpus documents whose hashed n-gram profile looks like a TARGET
  // domain: estimate bucket unigram+bigram distributions p_target and
  // p_raw over a FIXED feature space of B hashed buckets, weight every
  // document by  log w(x) = Σ_grams [ln p_t(bucket) − ln p_r(bucket)],
  // and keep the global top-K (the paper's deterministic top-k variant;
  // its Gumbel resample differs only in a seeded perturbation of the
  // same weights). Target here = the corpus's English slice, standing in
  // for the paper's Wikipedia/books formal-text target.
  //
  // Scale shape: ONE gram explode (localCheckpoint'd, the t61 shared-
  // frame seam) feeds both the distribution estimate — a B=256-row
  // aggregate, so model state is O(B) regardless of corpus size — and
  // the per-doc bucket counts; scoring is a broadcast join of the B-row
  // log-ratio table, then an exact BIGINT dot product per document.
  // Selection is orderBy+limit → TakeOrderedAndProject (K per partition,
  // K at the driver), never a global sort.
  //
  // Determinism: the only transcendental (the per-bucket log-ratio) is
  // nano-snapped ONCE per bucket (t54/t61 discipline) from exact integer
  // counts; per-doc weights are then pure BIGINT sums — bit-identical
  // under any partitioning — and the top-K cut tie-breaks by doc_id.
  // ---------------------------------------------------------------------
  private[operators] val DsirBuckets = 256
  private[operators] val DsirTopK = 100
  private[operators] val DsirTargetLang = "en"
  private val DsirAlphaB = DsirBuckets / 2.0 // additive smoothing α=0.5 per bucket

  /** Unigram+bigram array over a tokenized `__t` column; the
    * struct/filter detour (t61) keeps a trailing null w2 from collapsing
    * into a duplicate unigram.
    */
  private def dsirGramArray: Column = {
    val t = col("__t")
    concat(
      t,
      transform(
        filter(
          transform(sequence(lit(1), greatest(size(t) - 1, lit(1))),
            i => struct(try_element_at(t, i).as("w1"),
              try_element_at(t, i + lit(1)).as("w2"))),
          s => s.getField("w2").isNotNull),
        s => concat_ws(" ", s.getField("w1"), s.getField("w2"))))
  }

  /** (doc_id, lang, bucket) for every unigram+bigram occurrence. */
  private[graft] def dsirGramsFrom(d: DataFrame): DataFrame =
    d.withColumn("__t", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), explode(dsirGramArray).as("g"))
      .select(col("doc_id"), col("lang"),
        pmod(PortableHash.h60(col("g")), lit(DsirBuckets.toLong)).as("b"))

  def d59DsirSelect(spark: SparkSession, dir: String): DataFrame =
    dsirSelectFrom(Tables.documents(spark, dir))

  /** The B-row (b, lr9) log-ratio model over a (doc_id, lang, bucket)
    * occurrence frame; buckets unseen in the fitting corpus are absent
    * (their smoothed prior is [[dsirOovLr9]]).
    */
  private def dsirModelOf(pairs: DataFrame): DataFrame = {
    val stats = pairs.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val tot = stats.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    def lnP(c: Column, t: Column): Column =
      log((c.cast(DoubleType) + lit(0.5)) / (t.cast(DoubleType) + lit(DsirAlphaB)))
    stats.crossJoin(broadcast(tot))
      .withColumn("lr9", floor((lnP(col("ct"), col("tt")) - lnP(col("cr"), col("tr")))
        * lit(1e9) + lit(0.5)).cast(LongType))
      .select(col("b"), col("lr9"))
  }

  /** Fit the bucket model on a (doc_id, lang, text) corpus — the
    * training half of the stream-scoring seam.
    */
  private[graft] def dsirModelFrom(d: DataFrame): DataFrame =
    dsirModelOf(dsirGramsFrom(d))

  /** Smoothed log-ratio for a bucket with zero occurrences in a fitting
    * corpus of (tt target, tr raw) gram totals — the OOV prior a stream
    * scorer uses for buckets the fitted model never saw.
    */
  private[graft] def dsirOovLr9(tt: Long, tr: Long): Long =
    math.floor((math.log(0.5 / (tt + DsirAlphaB)) - math.log(0.5 / (tr + DsirAlphaB)))
      * 1e9 + 0.5).toLong

  /** Exact per-doc importance weights (doc_id, lang, w9) — shared by
    * the top-K selection (d59) and the Gumbel resample (d60).
    */
  private[graft] def dsirWeightsFrom(d: DataFrame): DataFrame = {
    // the gram explosion feeds both the model aggregate and the per-doc
    // counts — materialize it once (t61's shared-frame idiom)
    val pairs = dsirGramsFrom(d).graftCheckpoint(true)
    val model = dsirModelOf(pairs)
    pairs.groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(model), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c") * col("lr9")).as("w9"))
      .select(col("doc_id"), col("lang"), col("w9"))
  }

  /** DSIR over any (doc_id, lang, text) frame — spec entry point. */
  private[graft] def dsirSelectFrom(d: DataFrame): DataFrame =
    dsirWeightsFrom(d)
      .orderBy(col("w9").desc, col("doc_id"))
      .limit(DsirTopK)

  /** Stateless per-row DSIR scorer against a FROZEN model: the B-bucket
    * log-ratio table rides along as a literal array (B is a fixed
    * config-sized constant), so scoring is a pure projection — no
    * explode, no join, no stateful aggregation — and the SAME expression
    * tree scores a STREAM in Append mode (the t55/t71/t75 ingest-gate
    * pattern; StreamingSpec pins stream ≡ batch). `lr9ByBucket(b)` must
    * hold the fitted model's log-ratio for bucket b, with [[dsirOovLr9]]
    * in buckets the fitting corpus never populated.
    */
  private[graft] def dsirScoresFrom(df: DataFrame, lr9ByBucket: Seq[Long]): DataFrame = {
    require(lr9ByBucket.length == DsirBuckets, s"model must cover all $DsirBuckets buckets")
    val lr9 = array(lr9ByBucket.map(lit(_)): _*)
    df.withColumn("__t", split(col("text"), " "))
      .select(col("doc_id"), col("lang"),
        aggregate(
          transform(dsirGramArray, g => element_at(lr9,
            (pmod(PortableHash.h60(g), lit(DsirBuckets.toLong)) + lit(1L))
              .cast("int"))),
          lit(0L), (acc, x) => acc + x).as("w9"))
  }

  // ---------------------------------------------------------------------
  // d60: DSIR Gumbel-top-k resample — the paper's ACTUAL sampler (d59's
  // deterministic top-K is its baseline variant): perturb each log
  // weight with seeded Gumbel noise and take the top K of
  //   key = log w(x) + G,  G = −ln(−ln u),
  // which draws K documents WITHOUT replacement with probability
  // proportional to w(x) (the Gumbel-max trick). "Random" = the
  // engine's h60 gadget over (doc_id, seed) — u = (h + 0.5)/2^60 is a
  // pure function of (data, seed), so the sample is reproducible
  // across engines, re-runs and partitionings, like d46/t73.
  //
  // Determinism: w9 is d59's exact BIGINT; the Gumbel perturbation is
  // snapped to integer nanos per row (the double-ln wobble is orders of
  // magnitude under the snap); key = w9 + g9 stays in BIGINT; the top-K
  // cut ties-breaks by doc_id. Same TakeOrdered shape as d59.
  // ---------------------------------------------------------------------
  private[operators] val GumbelSeed = 7
  private val HashSpaceDouble = 1152921504606846976.0 // 2^60

  def d60DsirResample(spark: SparkSession, dir: String): DataFrame =
    dsirResampleFrom(Tables.documents(spark, dir))

  private[graft] def dsirResampleFrom(d: DataFrame): DataFrame =
    dsirWeightsFrom(d)
      .withColumn("u",
        (PortableHash.h60(concat_ws(":", col("doc_id"), lit(GumbelSeed))).cast(DoubleType)
          + lit(0.5)) / lit(HashSpaceDouble))
      .withColumn("g9",
        floor(-log(-log(col("u"))) * lit(1e9) + lit(0.5)).cast(LongType))
      .withColumn("key9", col("w9") + col("g9"))
      .select(col("doc_id"), col("lang"), col("w9"), col("g9"), col("key9"))
      .orderBy(col("key9").desc, col("doc_id"))
      .limit(DsirTopK)

  val d60DsirResampleSql: String = {
    val uExpr = s"(CAST(${PortableHash.h60Sql(s"doc_id || ':$GumbelSeed'")} AS DOUBLE) + 0.5)" +
      s" / 1152921504606846976.0"
    s"""WITH $dsirCtes,
       |w AS (
       |  SELECT doc_id, lang, CAST(SUM(c * lr9) AS BIGINT) AS w9
       |  FROM db JOIN model USING (b)
       |  GROUP BY doc_id, lang),
       |g AS (
       |  SELECT doc_id, lang, w9,
       |    CAST(floor(-ln(-ln($uExpr)) * 1000000000.0 + 0.5) AS BIGINT) AS g9
       |  FROM w)
       |SELECT doc_id, lang, w9, g9, w9 + g9 AS key9
       |FROM g
       |ORDER BY key9 DESC, doc_id
       |LIMIT $DsirTopK""".stripMargin
  }

  /** The d59 CTE chain through the per-doc bucket counts (no leading
    * WITH) — shared by d59's top-K and d60's Gumbel resample.
    */
  // lazy: referenced by d60's SQL val, which is declared above this block
  private lazy val dsirCtes: String = {
    def lnP(c: String, t: String) =
      s"ln((CAST($c AS DOUBLE) + 0.5) / (CAST($t AS DOUBLE) + $DsirAlphaB))"
    s"""tk AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |ex AS (
       |  SELECT doc_id, lang,
       |    ${PortableHash.h60Sql("g")} % $DsirBuckets AS b
       |  FROM (
       |    SELECT doc_id, lang,
       |      unnest(t || list_transform(range(1, len(t)),
       |        i -> t[i] || ' ' || t[i + 1])) AS g
       |    FROM tk)),
       |stats AS (
       |  SELECT b, COUNT(*) AS cr,
       |    SUM(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS ct
       |  FROM ex GROUP BY b),
       |tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM stats),
       |model AS (
       |  SELECT b, CAST(floor((${lnP("ct", "tt")} - ${lnP("cr", "tr")})
       |    * 1000000000.0 + 0.5) AS BIGINT) AS lr9
       |  FROM stats, tot),
       |db AS (SELECT doc_id, lang, b, COUNT(*) AS c FROM ex GROUP BY 1, 2, 3)""".stripMargin
  }

  val d59DsirSelectSql: String =
    s"""WITH $dsirCtes
       |SELECT doc_id, lang, CAST(SUM(c * lr9) AS BIGINT) AS w9
       |FROM db JOIN model USING (b)
       |GROUP BY doc_id, lang
       |ORDER BY w9 DESC, doc_id
       |LIMIT $DsirTopK""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("d46_stratified_sample", d46StratifiedSample _, d46StratifiedSampleSql),
    QueryDef.sql("d51_weighted_sample", d51WeightedSample _, d51WeightedSampleSql),
    QueryDef.sql("d52_mixture_sample", d52MixtureSample _, d52MixtureSampleSql),
    QueryDef.sql("d56_split_assign", d56SplitAssign _, d56SplitAssignSql),
    QueryDef.sql("t73_shuffle_shard", t73ShuffleShard _, t73ShuffleShardSql),
    QueryDef.sql("t74_shard_manifest", t74ShardManifest _, t74ShardManifestSql),
    QueryDef.sql("d59_dsir_select", d59DsirSelect _, d59DsirSelectSql),
    QueryDef.sql("d60_dsir_resample", d60DsirResample _, d60DsirResampleSql),
  )
}
