package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

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

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("d46_stratified_sample", d46StratifiedSample _, d46StratifiedSampleSql),
  )
}
