package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.fidelity.WelfordAggregator
import graft.streaming.{RunningStats, WordCount}

/** Batch-mode oracle coverage for the reference's own operators
  * (SURVEY.md §2): the cumulative keyed statistics state machine (A2), the
  * whitespace-tokenize wordcount (F1+A1), and the JSON field extraction
  * (P1/P2) — run over the events/documents tables where `event_type`
  * stands in for `readTag_id` and `value` for `readValue` (FIXTURES.md).
  *
  * The oracle variant of the stats derives mean/m2/var from decimal-exact
  * sums via the naive identity (quirk Q4, `AVG:174-182`) so every compared
  * double is bit-identical across engines; the engine's Welford
  * (`var_samp`) path is pinned against it by StatsSpec within FP tolerance.
  */
object StatsOps {

  // ---------------------------------------------------------------------
  // q20: per-key cumulative stats — batch shape of the reference's
  // updateStateByKey state (AVG:102-171).
  // ---------------------------------------------------------------------
  def q20KeyedStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type").as("readTag_id"))
      .agg(
        sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType).as("summer"),
        count(col("value")).as("counter"),
        sum((col("value") * col("value")).cast(DecimalType(30, 8))).cast(DoubleType).as("sumsqr"),
        min(col("value")).as("bestmin"),
        max(col("value")).as("bestmax"))
      .withColumn("mean", col("summer") / col("counter"))
      .withColumn("m2", col("sumsqr") - col("summer") * col("summer") / col("counter"))
      .withColumn("var", col("m2") / (col("counter") - lit(1)))
      .orderBy(col("readTag_id"))

  val q20KeyedStatsSql: String =
    """SELECT readTag_id, summer, counter, sumsqr, bestmin, bestmax,
      |  summer / counter AS mean,
      |  sumsqr - summer * summer / counter AS m2,
      |  (sumsqr - summer * summer / counter) / (counter - 1) AS "var"
      |FROM (
      |  SELECT event_type AS readTag_id,
      |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS summer,
      |    COUNT(value) AS counter,
      |    CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS sumsqr,
      |    MIN(value) AS bestmin,
      |    MAX(value) AS bestmax
      |  FROM events GROUP BY event_type
      |) t ORDER BY readTag_id""".stripMargin

  /** The engine's actual operator (Welford via var_samp) — oracle-checked
    * against DuckDB's own Welford (`var_samp`/`avg`). The FP-path columns
    * are rounded IN BOTH ENGINES at a margin over the cross-engine delta
    * that is MEASURED per scale factor, not assumed: SumModeMarginSpec
    * computes each total's distance to its nearest rounding boundary vs
    * its vs-exact double-summation error and asserts ≥50× headroom at
    * both gated SFs (tightest measured point: 152×, sf0.1 sumsqr — the
    * round-3 "≥4 orders of magnitude" claim was optimistic). The error
    * grows with corpus size; when the spec's bar breaks at a larger SF,
    * these columns move to the q20 decimal-exact recipe. StatsSpec
    * additionally pins the unrounded values to q20's decimal-exact path
    * within FP tolerance.
    */
  def q20bWelfordStats(spark: SparkSession, dir: String): DataFrame =
    RunningStats(Tables.events(spark, dir), col("event_type"), col("value"))
      .select(col("readTag_id"),
        round(col("summer"), 4).as("summer"), col("counter"),
        round(col("sumsqr"), 2).as("sumsqr"),
        col("bestmin"), col("bestmax"),
        round(col("mean"), 6).as("mean"),
        round(col("m2"), 2).as("m2"),
        round(col("var"), 4).as("var"))
      .orderBy(col("readTag_id"))

  val q20bWelfordStatsSql: String =
    """SELECT event_type AS readTag_id,
      |  ROUND(SUM(value), 4) AS summer,
      |  COUNT(value) AS counter,
      |  ROUND(SUM(value * value), 2) AS sumsqr,
      |  MIN(value) AS bestmin,
      |  MAX(value) AS bestmax,
      |  ROUND(AVG(value), 6) AS mean,
      |  ROUND(COALESCE(VAR_SAMP(value) * (COUNT(value) - 1), 0), 2) AS m2,
      |  ROUND(COALESCE(VAR_SAMP(value), 0), 4) AS "var"
      |FROM events GROUP BY event_type ORDER BY readTag_id""".stripMargin

  /** Byte-faithful typed-Aggregator variant (fidelity harness) — same
    * rounded-oracle scheme as q20b. The order-dependent `delta` loop-leak
    * (quirk Q3) is excluded from the projection: it is inherently
    * partition-order-defined and stays pinned by WelfordSpec instead.
    * `counter` is a Double in the reference's state vector (quirk Q6), so
    * the oracle casts its count to DOUBLE to keep the hash dtype-stable.
    */
  def q20cFidelityStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = new WelfordAggregator(sentinelInit = false).toColumn
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("s"))
      .select(col("key").as("readTag_id"),
        round(col("s.summer"), 4).as("summer"),
        col("s.counter").as("counter"),
        round(col("s.sumsqr"), 2).as("sumsqr"),
        col("s.bestmin").as("bestmin"), col("s.bestmax").as("bestmax"),
        round(col("s.mean"), 6).as("mean"),
        round(col("s.m2"), 2).as("m2"),
        round(col("s.variance"), 4).as("variance"))
      .orderBy(col("readTag_id"))
  }

  val q20cFidelityStatsSql: String =
    """SELECT event_type AS readTag_id,
      |  ROUND(SUM(value), 4) AS summer,
      |  CAST(COUNT(value) AS DOUBLE) AS counter,
      |  ROUND(SUM(value * value), 2) AS sumsqr,
      |  MIN(value) AS bestmin,
      |  MAX(value) AS bestmax,
      |  ROUND(AVG(value), 6) AS mean,
      |  ROUND(COALESCE(VAR_SAMP(value) * (COUNT(value) - 1), 0), 2) AS m2,
      |  ROUND(COALESCE(VAR_SAMP(value), 0), 4) AS variance
      |FROM events GROUP BY event_type ORDER BY readTag_id""".stripMargin

  // ---------------------------------------------------------------------
  // q21: whitespace-tokenize wordcount (AGG:74-94) over documents.text.
  // ---------------------------------------------------------------------
  def q21WordCount(spark: SparkSession, dir: String): DataFrame =
    WordCount(Tables.documents(spark, dir), col("text"))
      .orderBy(col("word"))

  val q21WordCountSql: String =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY word""".stripMargin

  // ---------------------------------------------------------------------
  // q22: JSON field extraction (P1/P2, AVG:202-214) — get_json_object on
  // the events.props payload, grouped on the extracted value.
  // ---------------------------------------------------------------------
  def q22JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType).as("sum_value"))
      .orderBy(col("k"))

  val q22JsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q20_keyed_stats", q20KeyedStats _, q20KeyedStatsSql),
    QueryDef.sql("q20b_welford_stats", q20bWelfordStats _, q20bWelfordStatsSql),
    QueryDef.sql("q20c_fidelity_stats", q20cFidelityStats _, q20cFidelityStatsSql),
    QueryDef.sql("q21_wordcount", q21WordCount _, q21WordCountSql),
    QueryDef.sql("q22_json_extract", q22JsonExtract _, q22JsonExtractSql),
  )
}
