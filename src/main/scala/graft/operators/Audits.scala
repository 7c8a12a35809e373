package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

import graft.{QueryDef, Tables}

/** Statistical data-audit operators over the order book — the
  * fraud/quality-screening siblings of the `documents` curation gates
  * (SURVEY §2.7 extension set; the reference has no batch surface at all,
  * SURVEY §0).
  *
  * All three are one-or-two-shuffle aggregates whose OUTPUT is tiny
  * (digits, qualifying pairs, nations) regardless of input scale — the
  * audit-report shape a 100 TB pipeline wants: scan once, aggregate to a
  * bounded result, never materialize row-level intermediates.
  */
object Audits {

  // ---------------------------------------------------------------------
  // q92: Benford first-significant-digit audit on l_extendedprice.
  // Digit extraction is integer-exact (floor → BIGINT → first decimal
  // char; prices are >= 1 by TPC-H construction), the 9-row digit
  // histogram is one partial/final hash agg over the scan, and the
  // expected-frequency / chi-square arithmetic runs on the 9-row result.
  // ---------------------------------------------------------------------
  def q92Benford(spark: SparkSession, dir: String): DataFrame = {
    val observed = Tables.lineitem(spark, dir)
      .select(substring(floor(col("l_extendedprice")).cast(LongType)
        .cast("string"), 1, 1).cast(IntegerType).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    // every Benford cell contributes even at zero observed count — on a
    // skewed input an absent digit is exactly the deviation the audit
    // must flag, so the chi-square runs over all 9 cells, not just the
    // digits that happened to appear (ADVICE r09)
    val digits = spark.range(1, 10)
      .select(col("id").cast(IntegerType).as("digit"))
      .join(observed, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    // total as a broadcast scalar, not an unpartitioned window: same
    // 9-row result, but no single-partition WindowExec in the plan
    digits
      .crossJoin(broadcast(digits.agg(sum(col("n")).as("tot"))))
      .withColumn("obs_freq", round(col("n").cast(DoubleType) / col("tot"), 6))
      .withColumn("exp_freq", round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("chi2_part", round(
        pow(col("n").cast(DoubleType) - col("tot") * log10(lit(1.0) + lit(1.0) / col("digit")), 2)
          / (col("tot") * log10(lit(1.0) + lit(1.0) / col("digit"))), 6))
      .select(col("digit"), col("n"), col("obs_freq"), col("exp_freq"), col("chi2_part"))
      .orderBy(col("digit"))
  }

  val q92BenfordSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM lineitem),
      |h0 AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      |h AS (
      |  SELECT g.digit, CAST(COALESCE(h0.n, 0) AS BIGINT) AS n
      |  FROM (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit) g
      |  LEFT JOIN h0 ON g.digit = h0.digit),
      |t AS (SELECT h.*, CAST(SUM(n) OVER () AS BIGINT) AS tot FROM h)
      |SELECT digit, n,
      |  ROUND(CAST(n AS DOUBLE) / tot, 6) AS obs_freq,
      |  ROUND(log10(1.0 + 1.0 / digit), 6) AS exp_freq,
      |  ROUND(pow(CAST(n AS DOUBLE) - tot * log10(1.0 + 1.0 / digit), 2)
      |        / (tot * log10(1.0 + 1.0 / digit)), 6) AS chi2_part
      |FROM t
      |ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------------
  // q93: market-basket association rules (support / confidence / lift)
  // over within-order part pairs. The pair generator is a self-join on
  // the ORDER KEY — per-order fan-out is bounded by basket size (~4
  // lineitems → <=6 pairs), so candidate volume grows LINEARLY with
  // orders; the join key is the natural shuffle key and AQE handles any
  // hot order. Item counts and the basket total are separate bounded
  // aggregates; the totals scalar joins back by broadcast (it is one
  // row). MinSup=2 keeps the rule table output-bounded.
  // ---------------------------------------------------------------------
  private val MinSup = 2

  def q93BasketLift(spark: SparkSession, dir: String): DataFrame = {
    // the basket frame feeds FOUR consumers (n, item, both self-join
    // sides) — materialize the scan+distinct once instead of executing
    // it per consumer (ADVICE r09; the d55/d57 shared-frame idiom)
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint()
    val n = b.select(countDistinct(col("l_orderkey")).as("n_orders"))
    val item = b.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    val pairs = b.as("a").join(b.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= MinSup)
    pairs
      .join(item.select(col("l_partkey").as("part_a"), col("n_item").as("n_a")), "part_a")
      .join(item.select(col("l_partkey").as("part_b"), col("n_item").as("n_b")), "part_b")
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast(DoubleType) / col("n_a"), 6).as("confidence"),
        round(col("n_ab").cast(DoubleType) * col("n_orders") /
          (col("n_a").cast(DoubleType) * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
  }

  val q93BasketLiftSql: String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
       |item AS (SELECT l_partkey, COUNT(*) AS n_item FROM b GROUP BY 1),
       |pairs AS (
       |  SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b, COUNT(*) AS n_ab
       |  FROM b a JOIN b b2
       |    ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $MinSup)
       |SELECT part_a, part_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
       |  ROUND(CAST(n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
       |  ROUND(CAST(n_ab AS DOUBLE) * n.n_orders /
       |        (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
       |FROM pairs
       |JOIN item ia ON ia.l_partkey = part_a
       |JOIN item ib ON ib.l_partkey = part_b
       |CROSS JOIN n
       |ORDER BY lift DESC, part_a, part_b""".stripMargin

  // ---------------------------------------------------------------------
  // q94: Gini concentration of customer revenue per nation (Lorenz-rank
  // formula G = 2·Σ i·x_i / (n·Σx) − (n+1)/n over revenue ascending).
  // Revenue lives on the exact cents grid (BIGINT) so the rank order and
  // the mass sums are engine-identical; ties rank by custkey but tied
  // revenues contribute the same Σ i·x_i under any tie permutation, so
  // the coefficient is order-independent anyway. Shape: lineitem⋈orders
  // aggregates to one row per CUSTOMER before anything sorts — the
  // Lorenz ranks cover |customers| rows per nation, never line items,
  // and come from `rankByRange` (range-partitioned slices + broadcast
  // offsets), so rank parallelism is the slice count, not |nations|
  // (VERDICT r09 #7).
  // ---------------------------------------------------------------------
  def q94Gini(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast(LongType)).as("rev_cents"))
    val named = rev
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("rev_cents"))
    Relational.rankByRange(named, Seq("n_name"),
        Seq(col("rev_cents"), col("c_custkey")), "i", "__n")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("rev_cents")).as("sx"),
        // decimal accumulator: rank × cents summed as LongType wraps past
        // 2^63 around SF~1000 while the DuckDB oracle promotes to HUGEINT
        // — a silent cross-engine divergence exactly at scale (ADVICE
        // r09). The rank is widened to decimal BEFORE the multiply
        // (mirroring the oracle's CAST(i AS HUGEINT) * rev_cents): a cast
        // applied to the product would still compute it in long and can
        // wrap per-row at extreme rank×cents magnitudes (ADVICE r10)
        sum(col("i").cast(DecimalType(38, 0)) * col("rev_cents")).as("six"))
      .select(col("n_name"), col("n_cust"),
        round(col("sx").cast(DoubleType) / 100.0, 2).as("total_rev"),
        round(lit(2.0) * col("six") / (col("n_cust") * col("sx").cast(DoubleType))
          - (col("n_cust") + lit(1.0)) / col("n_cust"), 6).as("gini"))
      .orderBy(col("n_name"))
  }

  val q94GiniSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey),
      |ranked AS (
      |  SELECT n_name, rev_cents,
      |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY rev_cents, c_custkey) AS i
      |  FROM rev
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |SELECT n_name, COUNT(*) AS n_cust,
      |  ROUND(CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE) / 100.0, 2) AS total_rev,
      |  ROUND(2.0 * SUM(CAST(i AS HUGEINT) * rev_cents) / (COUNT(*) * CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE))
      |        - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
      |FROM ranked
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q92_benford", q92Benford _, q92BenfordSql),
    QueryDef.sql("q93_basket_lift", q93BasketLift _, q93BasketLiftSql),
    QueryDef.sql("q94_gini", q94Gini _, q94GiniSql),
  )
}
