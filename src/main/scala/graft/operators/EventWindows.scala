package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}

/** Event-time windowing over the `events` table — session and sliding
  * windows (SURVEY.md §2.7 rows 2-3; the reference has no windowing at
  * all, its only notion of time is the 2 s processing-time micro-batch,
  * KafkaStreamAverageCalculator.java:65).
  *
  * Both operators use Spark's native window expressions
  * (`session_window`, `window`) so the identical aggregation runs as a
  * streaming query with a watermark (see [[graft.streaming.Watermarks]]
  * and StreamingSpec's late-data test); the batch forms here are the
  * DuckDB-oracle-checked shape.
  *
  * Oracle parity: all boundary arithmetic is done on integer microseconds
  * (`unix_micros` / `epoch_us`) — Spark's µs-truncated event time and
  * DuckDB's µs-truncated parquet read agree exactly, and BIGINT compare
  * avoids timezone-representation issues entirely.
  *
  * Scale: session windows shuffle once on the session key (user_id) and
  * sort within partitions — Spark's physical plan merges sessions in a
  * single pass per key (UpdatingSessionsExec), state O(open sessions) in
  * streaming. Sliding windows expand each row into windowLength/slide
  * rows (here 2×) BEFORE the shuffle — partial aggregation still applies,
  * so the shuffle carries one partial row per (window × type × map task),
  * not per event.
  */
object EventWindows {

  private val SessionGap = "6 hours"
  private val SessionGapUs = 6L * 3600 * 1000000

  // ---------------------------------------------------------------------
  // q16: session windows — per-user sessions separated by >= 6 h of
  // inactivity. A session's end is last-event time + gap (end-exclusive
  // merge rule: an event at exactly start+gap opens a NEW session).
  // ---------------------------------------------------------------------
  def q16SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), SessionGap).as("sw"))
      .agg(count(lit(1)).as("n_events"), Relational.dsum(col("value"), 6).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Gaps-and-islands formulation of the same sessions: a row opens a new
    * session iff it is >= gap after its predecessor; islands are numbered
    * by a running sum of the new-session flags.
    */
  val q16SessionWindowSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
       |flagged AS (
       |  SELECT user_id, ts_us, value,
       |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
       |              >= $SessionGapUs
       |         OR lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM e),
       |islands AS (
       |  SELECT user_id, ts_us, value,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
       |                     ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM flagged)
       |SELECT user_id,
       |  MIN(ts_us) AS session_start_us,
       |  MAX(ts_us) + $SessionGapUs AS session_end_us,
       |  COUNT(*) AS n_events,
       |  ${Relational.dsumSql("value", 6)} AS sum_value
       |FROM islands
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start_us""".stripMargin

  private val SlideUs = 30L * 60 * 1000000   // 30 min
  private val WindowUs = 2 * SlideUs         // 1 h window = 2 slides

  // ---------------------------------------------------------------------
  // q17: sliding windows — 1 h windows every 30 min, per event type.
  // Each event contributes to exactly windowLength/slide = 2 windows.
  // ---------------------------------------------------------------------
  def q17SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Relational.dsum(col("value"), 6).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("w_start_us"), col("event_type"))

  /** Explicit expansion of the same windows: an event at t falls in the
    * windows starting at slide-aligned (t div slide − k)·slide for
    * k ∈ {0, 1} — both always contain t since window = 2 slides (Spark
    * aligns window origins to the unix epoch; so does integer division).
    */
  val q17SlidingWindowSql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, event_type, value FROM events),
       |expanded AS (
       |  SELECT ((ts_us // $SlideUs) - k) * $SlideUs AS w_start_us,
       |    event_type, value
       |  FROM e CROSS JOIN range(0, ${WindowUs / SlideUs}) r(k))
       |SELECT w_start_us, event_type,
       |  COUNT(*) AS n_events,
       |  ${Relational.dsumSql("value", 6)} AS sum_value
       |FROM expanded
       |GROUP BY w_start_us, event_type
       |ORDER BY w_start_us, event_type""".stripMargin

  private val JoinBoundSec = 21600L // 6 h click→purchase attribution bound

  // ---------------------------------------------------------------------
  // q37: the batch shape of the watermarked stream-stream interval join
  // ([[graft.streaming.StreamJoin.intervalJoin]] — SAME code path; the
  // watermark node is eliminated on batch input): click → purchase pairs
  // of the same user within 6 h. Gap is exact integer microseconds, so
  // the whole row is hash-comparable. One shuffle on user_id; the range
  // predicate prunes within each key group.
  // ---------------------------------------------------------------------
  def q37StreamJoinShape(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click").drop("event_type")
    val buys = ev.filter(col("event_type") === "purchase").drop("event_type")
    graft.streaming.StreamJoin
      .intervalJoin(clicks, buys, "user_id", "ts", "10 minutes", JoinBoundSec)
      .select(col("l_event_id").as("click_id"), col("r_event_id").as("purchase_id"),
        col("l_user_id").as("user_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("gap_us"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  val q37StreamJoinShapeSql: String =
    s"""WITH c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
       |p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase')
       |SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       |  c.user_id AS user_id,
       |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       |FROM c JOIN p ON c.user_id = p.user_id
       |  AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL $JoinBoundSec SECONDS
       |ORDER BY click_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------------
  // q39: funnel analysis — per-user ordered progression signup → click →
  // purchase (each stage strictly after the previous stage's FIRST
  // event), reported as per-stage user counts. The standard product-
  // analytics shape: each stage is a keyed min-aggregate joined to the
  // previous stage — shuffles on user_id only, no event×event blow-up,
  // and AQE reuses the exchange across stages at scale.
  // ---------------------------------------------------------------------
  def q39Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(s1, "1_signup")
      .unionByName(stage(s2, "2_click_after_signup"))
      .unionByName(stage(s3, "3_purchase_after_click"))
      .orderBy(col("stage"))
  }

  val q39FunnelSql: String =
    s"""WITH s1 AS (
       |  SELECT user_id, MIN(ts) AS t1 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |s2 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
       |s3 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
       |SELECT stage, n_users FROM (
       |  SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
       |  UNION ALL
       |  SELECT '2_click_after_signup', COUNT(*) FROM s2
       |  UNION ALL
       |  SELECT '3_purchase_after_click', COUNT(*) FROM s3)
       |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------------
  // q45: event-type transition matrix — the Markov-chain view of user
  // behavior (what follows what). One window (lag over each user's
  // time-ordered events; (user_id, ts) is unique in this data, so the
  // order is total) + one hash aggregate over the 5×5 pair space.
  // Shuffles once on user_id; the aggregate output is O(|types|²)
  // regardless of corpus size.
  // ---------------------------------------------------------------------
  def q45Transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  val q45TransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type, COUNT(*) AS n
      |FROM seq WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q46: cohort retention — users bucketed by first-signup week, counted
  // as active in each subsequent week. Week arithmetic runs on integer
  // microseconds (epoch-aligned floor division — exact, timezone-free).
  // Two shuffles on user_id (cohort min-agg + activity join) and one
  // count-distinct per (cohort, offset); cohort cardinality is
  // O(weeks²), corpus-independent.
  // ---------------------------------------------------------------------
  private val WeekUs = 7L * 24 * 3600 * 1000000L

  def q46Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    // `div`, not `/`: Column./ is DOUBLE division, which loses low bits
    // on epoch-microsecond magnitudes (> 2^53) — see Tables.events
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("t1us"))
      .select(col("user_id"), expr(s"t1us div $WeekUs").as("cohort_week"))
    ev.withColumn("week", expr(s"unix_micros(ts) div $WeekUs"))
      .join(cohort, "user_id")
      .filter(col("week") >= col("cohort_week"))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q46RetentionSql: String =
    s"""WITH cohort AS (
       |  SELECT user_id, MIN(epoch_us(ts)) // $WeekUs AS cohort_week
       |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
       |activity AS (
       |  SELECT e.user_id, epoch_us(e.ts) // $WeekUs AS week, c.cohort_week
       |  FROM events e JOIN cohort c USING (user_id))
       |SELECT cohort_week, week - cohort_week AS week_offset,
       |  COUNT(DISTINCT user_id) AS n_active
       |FROM activity
       |WHERE week >= cohort_week
       |GROUP BY cohort_week, week_offset
       |ORDER BY cohort_week, week_offset""".stripMargin

  // ---------------------------------------------------------------------
  // q52: time-series gap-fill / resample — the dense-calendar operator
  // every monitoring/feature pipeline needs and the reference (whose only
  // time axis is the 2 s micro-batch) cannot express: hourly counts per
  // event_type on a DENSE hour spine (absent hours materialized with
  // n=0), plus a forward-filled last-observed hourly sum.
  //
  // Shape: (1) aggregate events → (type, hour) partials — the ONLY pass
  // over the raw table, shrinking it to |types|×|hours| rows; (2) build
  // the spine distributedly: one 1-row global [min,max] agg broadcast-
  // joined onto the distinct types, then sequence()+explode per type row
  // (no driver-side loop, no collect); (3) left-join partials onto the
  // spine and forward-fill with last(ignoreNulls) windowed by type.
  // At 100 TB the spine is |types| × timespan-hours — the same order as
  // the output a gap-fill must produce by definition — so nothing here
  // scales with the raw event count except the initial partial agg.
  // All hour arithmetic is integer µs (epoch_us % 3600e6), the same
  // timezone-free BIGINT convention as q16/q17.
  // ---------------------------------------------------------------------
  private val HourUs = 3600L * 1000000

  def q52GapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .select(col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("ts")) % HourUs).as("h"),
        col("value"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), Relational.dsum(col("value"), 6).as("sum_value"))
    val bounds = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val spine = hourly.select(col("event_type")).distinct()
      .join(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(HourUs))).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.cast("int").as("filled"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("ff_sum_value"))
      .orderBy(col("event_type"), col("hour_us"))
  }

  val q52GapFillSql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_us(ts) - epoch_us(ts) % $HourUs AS h,
       |    COUNT(*) AS n, ${Relational.dsumSql("value", 6)} AS sum_value
       |  FROM events GROUP BY 1, 2),
       |bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly),
       |spine AS (
       |  SELECT t.event_type, unnest(generate_series(lo, hi, $HourUs)) AS h
       |  FROM (SELECT DISTINCT event_type FROM hourly) t, bounds)
       |SELECT s.event_type, s.h AS hour_us,
       |  COALESCE(hh.n, 0) AS n,
       |  CAST(hh.n IS NULL AS INTEGER) AS filled,
       |  LAST_VALUE(hh.sum_value IGNORE NULLS) OVER (
       |    PARTITION BY s.event_type ORDER BY s.h
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_sum_value
       |FROM spine s LEFT JOIN hourly hh ON s.event_type = hh.event_type AND s.h = hh.h
       |ORDER BY s.event_type, hour_us""".stripMargin

  // ---------------------------------------------------------------------
  // q60: OHLC resample bars — the time-series downsampling primitive
  // (finance bars / dashboard rollups): per (event_type, day), first
  // (open) / max (high) / min (low) / last (close) of the value plus the
  // tick count. Open/close are positional order statistics: two
  // row_number passes over the SAME (type, day) partitioning — one
  // ascending, one descending on (ts, event_id) — share ONE exchange
  // (Catalyst plans two sorts over the same shuffle), then a single hash
  // aggregate folds all five outputs. Values ride the cents grid; the
  // day-level output is O(|types| × |days|), corpus-independent.
  //
  // The (ts, event_id) tiebreak makes the order total in both engines;
  // the oracle orders by epoch_us(ts) to mirror Spark's µs timestamps
  // exactly (events.parquet carries ns — see Tables.events).
  // ---------------------------------------------------------------------
  def q60OhlcBars(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("v"),
        col("ts"), col("event_id"))
    val wAsc = Window.partitionBy(col("event_type"), col("d"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wDesc = Window.partitionBy(col("event_type"), col("d"))
      .orderBy(col("ts").desc, col("event_id").desc)
    base
      .withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy(col("event_type"), col("d"))
      .agg(
        (sum(when(col("rn_a") === 1, col("v")).otherwise(0L)).cast(DoubleType) / lit(100.0)).as("open"),
        (max(col("v")).cast(DoubleType) / lit(100.0)).as("high"),
        (min(col("v")).cast(DoubleType) / lit(100.0)).as("low"),
        (sum(when(col("rn_d") === 1, col("v")).otherwise(0L)).cast(DoubleType) / lit(100.0)).as("close"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("d"))
  }

  val q60OhlcBarsSql: String =
    """WITH r AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                       ORDER BY epoch_us(ts), event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
      |  FROM events)
      |SELECT event_type, d,
      |  CAST(SUM(CASE WHEN rn_a = 1 THEN v ELSE 0 END) AS DOUBLE) / 100.0 AS open,
      |  CAST(MAX(v) AS DOUBLE) / 100.0 AS high,
      |  CAST(MIN(v) AS DOUBLE) / 100.0 AS low,
      |  CAST(SUM(CASE WHEN rn_d = 1 THEN v ELSE 0 END) AS DOUBLE) / 100.0 AS close,
      |  COUNT(*) AS n
      |FROM r GROUP BY event_type, d
      |ORDER BY event_type, d""".stripMargin

  // ---------------------------------------------------------------------
  // q61: path mining — each user's first-3-event journey as a path
  // string, counted across users (the "what do people do after signup"
  // query). The scale discipline is CAP BEFORE COLLECT: a windowed
  // row_number keeps only each user's first 3 events (one shuffle on
  // user_id), so the per-user array build touches ≤3 rows regardless of
  // how active a user is — no unbounded collect_list. Path frequency is
  // then a hash aggregate over strings whose cardinality is bounded by
  // |types|³, corpus-independent. sort_array over (rn, type) structs
  // makes the in-array order explicit rather than partition-dependent.
  // ---------------------------------------------------------------------
  def q61PathMining(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("rn"), col("event_type")))).as("steps"))
      .select(concat_ws(">", transform(col("steps"), s => s.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .where(col("n_users") >= 2)
      .orderBy(col("n_users").desc, col("path"))
  }

  val q61PathMiningSql: String =
    """WITH p AS (
      |  SELECT user_id,
      |    array_to_string(list_slice(
      |      list(event_type ORDER BY epoch_us(ts), event_id), 1, 3), '>') AS path
      |  FROM events GROUP BY user_id)
      |SELECT path, COUNT(*) AS n_users
      |FROM p GROUP BY path HAVING COUNT(*) >= 2
      |ORDER BY n_users DESC, path""".stripMargin

  // ---------------------------------------------------------------------
  // q64: rolling-frame anomaly detection — flag events whose value sits
  // outside a 3σ fence over the TRAILING 24 events of their type: the
  // streaming-monitor shape (bounded look-back, no global statistics),
  // and the one window-frame form the suite didn't exercise yet — a
  // bounded ROWS frame (q6 is cumulative/unbounded). One exchange on the
  // type key; two frame sums (Σv, Σv²) feed the fence.
  //
  // Determinism: the fence comparison is exact integer algebra on the
  // cents grid — (n·v − S)² > 9·(n·Σv² − S²) is z² > 3² cross-multiplied
  // (population σ), so no division or sqrt ever happens. Every term is
  // bounded by the FRAME (n ≤ 24), not the corpus: the arithmetic is
  // int64-safe at any scale factor. A 12-row warm-up guard keeps the
  // fence honest at partition starts. The frame orders on
  // (µs timestamp, event_id) — total, and mirrored via epoch_us in the
  // oracle (ns-precision parquet would otherwise reorder ties).
  // ---------------------------------------------------------------------
  def q64RollingAnomaly(spark: SparkSession, dir: String): DataFrame = {
    // materialized sort key + all three frame aggregates in one
    // projection → ONE Sort + ONE Window node (q65's lesson: stacked
    // withColumn windows over a computed sort key re-sort per aggregate)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(-23, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("tus"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("vc"))
      .select(col("*"),
        count(lit(1)).over(w).as("n"),
        sum(col("vc")).over(w).as("s"),
        sum(col("vc") * col("vc")).over(w).as("sxx"))
      .where(col("n") >= 12 &&
        (col("n") * col("vc") - col("s")) * (col("n") * col("vc") - col("s")) >
          lit(9L) * (col("n") * col("sxx") - col("s") * col("s")))
      .select(col("event_type"), col("event_id"),
        (col("vc").cast(DoubleType) / lit(100.0)).as("value"), col("n"))
      .orderBy(col("event_type"), col("event_id"))
  }

  val q64RollingAnomalySql: String =
    """WITH b AS (
      |  SELECT event_type, event_id, epoch_us(ts) AS tus,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
      |  FROM events),
      |r AS (
      |  SELECT event_type, event_id, vc,
      |    COUNT(*) OVER w AS n,
      |    CAST(SUM(vc) OVER w AS BIGINT) AS s,
      |    CAST(SUM(vc * vc) OVER w AS BIGINT) AS sxx
      |  FROM b
      |  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id
      |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT event_type, event_id, CAST(vc AS DOUBLE) / 100.0 AS value,
      |  CAST(n AS BIGINT) AS n
      |FROM r
      |WHERE n >= 12
      |  AND (n * vc - s) * (n * vc - s) > 9 * (n * sxx - s * s)
      |ORDER BY event_type, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q65: EWMA smoothing — the exponentially-weighted moving average every
  // monitoring stack pairs with q64's fence, in EXACT dyadic arithmetic.
  // A true infinite-history EWMA is a linear recurrence (not expressible
  // as a frame aggregate, and float-recursive in any engine); the
  // production form here is the 16-tap truncated EWMA with α = 1/2:
  // weight of the value j rows back is 2^(15−j), so the tail beyond the
  // frame carries < 2^-16 of the mass — below the output grid. Weighted
  // num/den are exact int64 (cents · 2^15 · 16 taps ≪ 2^63); the smoothed
  // value is emitted as a single floor division onto a micro-cent grid,
  // bit-identical in DuckDB.
  //
  // Plan shape: the 16 lag() taps all share ONE Window operator over one
  // exchange on event_type (PlanShapeSpec pins the single exchange) —
  // per-row cost is 16 adds inside whole-stage codegen, no self-joins,
  // no array building. At any scale this is a single sort-based window
  // pass; state is the 16-row frame, independent of history length.
  // Output is thinned on event_id % 37 (deterministic, corpus-relative)
  // purely to bound the dump size; the EWMA itself is computed over
  // EVERY event, and thinning AFTER the window keeps the pinned values'
  // frames full.
  // ---------------------------------------------------------------------
  private val EwmaTaps = 16

  def q65Ewma(spark: SparkSession, dir: String): DataFrame = {
    // The sort key must be a MATERIALIZED column and all 16 taps must
    // live in ONE projection: ordering a window by the raw expression
    // unix_micros(ts), or adding taps via successive withColumns, plans
    // 16 stacked Window nodes each with its own (unsatisfiable-ordering)
    // Sort — measured 7.0 s; this shape is one Sort + one Window, 0.6 s.
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("tus"), col("event_id"))
    val base = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("tus"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("vc"))
    val lagged = base.select(col("*") +:
      (0 until EwmaTaps).map(j => lag(col("vc"), j).over(w).as(s"v$j")): _*)
    val weight = (j: Int) => 1L << (EwmaTaps - 1 - j)
    val num = (0 until EwmaTaps).map(j =>
      coalesce(col(s"v$j"), lit(0L)) * lit(weight(j))).reduce(_ + _)
    val den = (0 until EwmaTaps).map(j =>
      when(col(s"v$j").isNotNull, lit(weight(j))).otherwise(lit(0L))).reduce(_ + _)
    lagged
      // vc ≥ 0 on this corpus (and den > 0 always: tap 0 is the current
      // row), so `div` floor ≡ DuckDB `//` with no negative-truncation
      // divergence — the q63 positive-operand discipline.
      .withColumn("num", num).withColumn("den", den)
      .withColumn("ewma_uc", expr("(num * 1000000) div den"))
      .where(col("event_id") % 37 === 0)
      .select(col("event_type"), col("event_id"), col("vc"), col("ewma_uc"))
      .orderBy(col("event_type"), col("event_id"))
  }

  val q65EwmaSql: String = {
    val lags = (0 until EwmaTaps).map(j =>
      s"lag(vc, $j) OVER w AS v$j").mkString(",\n      |    ")
    val num = (0 until EwmaTaps).map(j =>
      s"COALESCE(v$j, 0) * ${1L << (EwmaTaps - 1 - j)}").mkString(" + ")
    val den = (0 until EwmaTaps).map(j =>
      s"(CASE WHEN v$j IS NOT NULL THEN ${1L << (EwmaTaps - 1 - j)} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (
      |  SELECT event_type, event_id, epoch_us(ts) AS tus,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
      |  FROM events),
      |l AS (
      |  SELECT event_type, event_id, vc,
      |    $lags
      |  FROM b
      |  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id))
      |SELECT event_type, event_id, vc,
      |  (($num) * 1000000) // ($den) AS ewma_uc
      |FROM l
      |WHERE event_id % 37 = 0
      |ORDER BY event_type, event_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q70: running DISTINCT count over an ordered stream — "distinct users
  // seen to date" per event type, the cumulative-cardinality curve every
  // growth dashboard draws. Neither Spark nor a sane engine supports
  // COUNT(DISTINCT) OVER a running frame directly at scale (it implies a
  // per-row distinct SET in window state); the scalable form is the
  // first-seen decomposition: flag each (type, user)'s first event via
  // row_number = 1, then a running SUM of flags over the type's time
  // order. State per window is one counter, not a set — O(1) instead of
  // O(|users|) per frame. Two exchanges, inherently: one on (type, user)
  // for the first-seen election, one on type for the running sum.
  // Output thinned on event_id % 37 AFTER the windows (q65's dump
  // discipline); the curve is computed over every event.
  // ---------------------------------------------------------------------
  def q70RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val wRun = Window.partitionBy(col("event_type"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, lit(1L)).otherwise(lit(0L)))
      .withColumn("users_to_date", sum(col("first_seen")).over(wRun))
      .where(col("event_id") % 37 === 0)
      .select(col("event_type"), col("event_id"), col("users_to_date"))
      .orderBy(col("event_type"), col("event_id"))
  }

  val q70RunningDistinctSql: String =
    """WITH b AS (
      |  SELECT event_type, event_id, user_id, epoch_us(ts) AS tus FROM events),
      |f AS (
      |  SELECT event_type, event_id, tus,
      |    CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
      |                                 ORDER BY tus, event_id) = 1
      |         THEN 1 ELSE 0 END AS first_seen
      |  FROM b)
      |,run AS (
      |  -- the running sum must see EVERY row; the dump thinning applies
      |  -- outside this block (WHERE in the same block would filter the
      |  -- window's input, unlike Spark's post-window .where)
      |  SELECT event_type, event_id,
      |    CAST(SUM(first_seen) OVER (PARTITION BY event_type ORDER BY tus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS users_to_date
      |  FROM f)
      |SELECT event_type, event_id, users_to_date
      |FROM run
      |WHERE event_id % 37 = 0
      |ORDER BY event_type, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q75: autocorrelation function (ACF at lags 1..3) of the daily value
  // series per event type — the seasonality/trend diagnostic a
  // forecasting pipeline runs before choosing a model. Two stages, both
  // vocabulary-sized after the first: (1) one hash aggregate collapses
  // the corpus to the per-(type, day) daily series in exact cents;
  // (2) ONE window with three lag taps (q65's single-projection
  // discipline — stacked withColumns would plan three Window nodes)
  // emits the lagged pairs, which unpivot via a 3-arm stack and feed a
  // per-(type, lag) moment aggregate. Windows and moments run over
  // |types|×|days| rows, never corpus rows.
  //
  // Determinism: q57's discipline exactly — moment sums are exact int64
  // (daily cents ≈ 1e7, squared products ×1e3 days ≈ 1e17 < 2^63; at
  // 1e4× the volume, swap the sums to DECIMAL(38,0)/HUGEINT), and the
  // Pearson formula runs the identical left-associated double algebra
  // in both engines on identical integers.
  // ---------------------------------------------------------------------
  private val AcfMaxLag = 3

  def q75Autocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("vc"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vc")).as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    // all lag taps in one projection → one Window node, one exchange
    val tapped = daily.select(
      col("event_type") +: col("v") +:
        (1 to AcfMaxLag).map(k => lag(col("v"), k).over(w).as(s"l$k")): _*)
    val arms = (1 to AcfMaxLag)
      .map(k => s"struct(${k}L as lag, v, l$k as vl)").mkString(", ")
    val pairs = tapped
      .select(col("event_type"), explode(expr(s"array($arms)")).as("p"))
      .select(col("event_type"), col("p.lag"), col("p.v"), col("p.vl"))
      .filter(col("vl").isNotNull)
    val m = pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("v")).as("sx"), sum(col("vl")).as("sy"),
        sum(col("v") * col("vl")).as("sxy"),
        sum(col("v") * col("v")).as("sxx"),
        sum(col("vl") * col("vl")).as("syy"))
    val dn = col("n_pairs").cast(DoubleType)
    def d(c: String) = col(c).cast(DoubleType)
    val (vx, vy) = (dn * d("sxx") - d("sx") * d("sx"),
      dn * d("syy") - d("sy") * d("sy"))
    // zero-variance guard (ADVICE r07), mirrored in the oracle SQL
    m.select(col("event_type"), col("lag"), col("n_pairs"),
        when(vx > 0 && vy > 0,
          (dn * d("sxy") - d("sx") * d("sy")) / sqrt(vx * vy)).as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  val q75AutocorrSql: String = {
    val arms = (1 to AcfMaxLag).map(k =>
      s"SELECT event_type, $k AS lag, v, l$k AS vl FROM tapped").mkString("\n|  UNION ALL\n|  ")
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS v
       |  FROM events GROUP BY 1, 2),
       |tapped AS (
       |  SELECT event_type, v,
       |    ${(1 to AcfMaxLag).map(k =>
              s"lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
              .mkString(",\n|    ")}
       |  FROM daily),
       |pairs AS (
       |  $arms),
       |m AS (
       |  SELECT event_type, lag, COUNT(*) AS n_pairs,
       |    SUM(v) AS sx, SUM(vl) AS sy, SUM(v * vl) AS sxy,
       |    SUM(v * v) AS sxx, SUM(vl * vl) AS syy
       |  FROM pairs WHERE vl IS NOT NULL GROUP BY 1, 2)
       |SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
       |  CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
       |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
       |        AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
       |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
       |  THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
       |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |  / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
       |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |         * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
       |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS acf
       |FROM m
       |ORDER BY event_type, lag""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q76: per-user session summary via the WINDOW-FUNCTION sessionization
  // path — the gaps-and-islands formulation as a first-class Spark plan
  // (q16 exercises the native session_window operator; its ORACLE is
  // already this formulation, so the two queries pin both engine paths
  // onto the same semantics). A session opens at the first event or
  // after a >= 6 h silence; the summary is per-user lifetime session
  // behavior — the LTV/engagement shape.
  //
  // Scale: ONE hash exchange on user_id carries both windows (flag +
  // running island id) AND both aggregates; everything after the scan
  // is partition-local to it. All outputs exact integers (no mean —
  // sums and counts, so no division leaves the integer grid).
  // ---------------------------------------------------------------------
  def q76SessionSummary(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val flagged = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("tus") - col("prev") >= SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("sid",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"),
        max(col("dur_us")).as("max_session_dur_us"),
        sum(col("dur_us")).as("active_us"))
      .orderBy(col("user_id"))
  }

  val q76SessionSummarySql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
       |flagged AS (
       |  SELECT user_id, tus, event_id,
       |    CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
       |              IS NULL
       |           OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
       |              >= $SessionGapUs
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM e),
       |isl AS (
       |  SELECT user_id, tus,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged),
       |sess AS (
       |  SELECT user_id, sid, COUNT(*) AS n_events,
       |    MAX(tus) - MIN(tus) AS dur_us
       |  FROM isl GROUP BY user_id, sid)
       |SELECT user_id, COUNT(*) AS n_sessions,
       |  CAST(SUM(n_events) AS BIGINT) AS n_events,
       |  MAX(n_events) AS max_session_events,
       |  MAX(dur_us) AS max_session_dur_us,
       |  CAST(SUM(dur_us) AS BIGINT) AS active_us
       |FROM sess GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q78: temporal-proximity attribution join — "count the clicks each
  // purchase saw from the same user in the 24 h before it", a band
  // predicate on TIME with no shared equi-timestamp. The naive plan is a
  // per-user cross join filtered by the interval (quadratic in per-user
  // activity); the engine's plan buckets both sides by ⌊ts/W⌋ with W =
  // the window width, probes exactly TWO buckets per purchase (its own
  // and the previous — any click within W sits in one of them), and
  // applies the exact interval filter after the equi-join on
  // (user, bucket). Candidate fan-out is bounded by per-(user, day)
  // activity — never all per-user pairs — and the probe arms cannot
  // double-count (distinct bucket values). This is d55's design point on
  // the time axis: exact result, sub-quadratic candidates, and the
  // registered ORACLE IS the naive range join, so the pruning is
  // hash-proven lossless. (q37's stream-stream interval join is the
  // same semantics in Structured Streaming; this is the batch/offline
  // attribution shape with the bucket trick made explicit.)
  // ---------------------------------------------------------------------
  private val AttrWindowUs = 86400000000L // 24 h

  def q78AttributionJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus").as("c_tus"),
        expr(s"tus div ${AttrWindowUs}L").as("bucket"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus").as("p_tus"), col("event_id").as("p_id"))
    val probes = purchases.withColumn("bucket",
      explode(array(expr(s"p_tus div ${AttrWindowUs}L"),
        expr(s"p_tus div ${AttrWindowUs}L - 1"))))
    val pairs = probes.join(clicks, Seq("user_id", "bucket"))
      .filter(col("c_tus") >= col("p_tus") - AttrWindowUs &&
        col("c_tus") <= col("p_tus"))
    val attributed = pairs.groupBy(col("user_id"))
      .agg(countDistinct(col("p_id")).as("n_attributed"),
        count(lit(1)).as("n_pairs"))
    purchases.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"))
      .join(attributed, Seq("user_id"), "left")
      .select(col("user_id"), col("n_purchases"),
        coalesce(col("n_attributed"), lit(0L)).as("n_attributed"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  val q78AttributionJoinSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
       |pairs AS (
       |  SELECT p.user_id, p.event_id AS p_id
       |  FROM e p JOIN e c
       |    ON p.user_id = c.user_id
       |   AND p.event_type = 'purchase' AND c.event_type = 'click'
       |   AND c.tus >= p.tus - $AttrWindowUs AND c.tus <= p.tus),
       |attr AS (
       |  SELECT user_id, COUNT(DISTINCT p_id) AS n_attributed,
       |    COUNT(*) AS n_pairs
       |  FROM pairs GROUP BY user_id)
       |SELECT p.user_id AS user_id, COUNT(*) AS n_purchases,
       |  COALESCE(MAX(a.n_attributed), 0) AS n_attributed,
       |  COALESCE(MAX(a.n_pairs), 0) AS n_pairs
       |FROM e p LEFT JOIN attr a ON a.user_id = p.user_id
       |WHERE p.event_type = 'purchase'
       |GROUP BY p.user_id
       |ORDER BY p.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q80: lead-lag CROSS-correlation — does today's click volume predict
  // purchase volume k days later? q75's ACF measures a series against
  // itself; this is the two-series sibling (the marketing-attribution /
  // leading-indicator diagnostic). One hash aggregate collapses the
  // corpus to a per-day (click, purchase) pair table in exact cents —
  // conditional sums, so ONE pass and one tiny table — then a
  // lag-exploded self-join aligns day t clicks with day t+k purchases
  // (|days|×|lags| rows; the join is vocabulary-sized, never corpus-
  // sized) and a per-lag moment aggregate feeds q75's mirrored-double
  // Pearson. Days where either series is absent drop from that lag's
  // pairs (inner-join semantics, deterministic).
  // ---------------------------------------------------------------------
  private val XcorrMaxLag = 3

  def q80CrossCorr(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("vc"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "click", col("vc"))).as("x"),
        sum(when(col("event_type") === "purchase", col("vc"))).as("y"))
    val a = byDay.filter(col("x").isNotNull).select(col("day"), col("x"))
      .withColumn("lag", explode(expr(s"sequence(0L, ${XcorrMaxLag}L)")))
    val b = byDay.filter(col("y").isNotNull)
      .select(col("day").as("bday"), col("y"))
    val m = a.join(b, col("day") + col("lag") === col("bday"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val dn = col("n_pairs").cast(DoubleType)
    def d(c: String) = col(c).cast(DoubleType)
    val (vx, vy) = (dn * d("sxx") - d("sx") * d("sx"),
      dn * d("syy") - d("sy") * d("sy"))
    // zero-variance guard (ADVICE r07), mirrored in the oracle SQL
    m.select(col("lag"), col("n_pairs"),
        when(vx > 0 && vy > 0,
          (dn * d("sxy") - d("sx") * d("sy")) / sqrt(vx * vy)).as("xcorr"))
      .orderBy(col("lag"))
  }

  val q80CrossCorrSql: String =
    s"""WITH byday AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    CAST(SUM(CASE WHEN event_type = 'click'
       |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS y
       |  FROM events WHERE event_type IN ('click', 'purchase')
       |  GROUP BY 1),
       |pairs AS (
       |  SELECT l.lag, a.x, b.y
       |  FROM byday a
       |  CROSS JOIN (SELECT unnest(range(0, ${XcorrMaxLag + 1})) AS lag) l
       |  JOIN byday b ON a.day + l.lag = b.day
       |  WHERE a.x IS NOT NULL AND b.y IS NOT NULL),
       |m AS (
       |  SELECT lag, COUNT(*) AS n_pairs,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(y * y) AS BIGINT) AS syy
       |  FROM pairs GROUP BY lag)
       |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       |  CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
       |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
       |        AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
       |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
       |  THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
       |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |  / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
       |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |         * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
       |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS xcorr
       |FROM m
       |ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------------
  // q81: changepoint detection (AMOC — at-most-one-change, the max
  // mean-shift split): for every split point of each event type's daily
  // series, compare the prefix mean against the suffix mean and report
  // the split maximizing the absolute shift — the level-shift detector a
  // monitoring pipeline runs before alerting on a metric's regime change.
  //
  // Scale/determinism: the corpus collapses to the per-(type, day) daily
  // series first (one hash aggregate); every candidate split is then ONE
  // row of a window pass over that vocabulary-sized series — prefix sums
  // and totals ride a single exchange on event_type, never a per-split
  // rescan (the naive formulation is O(days²) per type). Prefix/suffix
  // sums and counts are exact int64; each mean is a single IEEE division
  // of those integers and the argmax orders by (shift DESC, day ASC) on
  // doubles that are bit-identical across engines (q57's discipline).
  // ---------------------------------------------------------------------
  def q81Changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("vc"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vc")).as("v"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("n1", row_number().over(wOrd).cast(LongType))
      .withColumn("cum", sum(col("v")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("v")).over(wAll))
      .filter(col("n1") < col("n"))
      .withColumn("mean_pre",
        col("cum").cast(DoubleType) / col("n1").cast(DoubleType))
      .withColumn("mean_post",
        (col("tot") - col("cum")).cast(DoubleType) /
          (col("n") - col("n1")).cast(DoubleType))
      .withColumn("shift", abs(col("mean_pre") - col("mean_post")))
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(col("shift").desc, col("day").asc)
    scored
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("n1").as("n_pre"), (col("n") - col("n1")).as("n_post"),
        col("mean_pre"), col("mean_post"), col("shift"))
      .orderBy(col("event_type"))
  }

  val q81ChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, day,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS n1,
      |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      |  FROM daily),
      |sc AS (
      |  SELECT event_type, day, n1, n,
      |    CAST(cum AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_pre,
      |    CAST(tot - cum AS DOUBLE) / CAST(n - n1 AS DOUBLE) AS mean_post
      |  FROM s WHERE n1 < n),
      |pick AS (
      |  SELECT event_type, day, n1, n, mean_pre, mean_post,
      |    abs(mean_pre - mean_post) AS shift,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY abs(mean_pre - mean_post) DESC, day ASC) AS rn
      |  FROM sc)
      |SELECT event_type, day AS split_day, n1 AS n_pre, n - n1 AS n_post,
      |  mean_pre, mean_post, shift
      |FROM pick WHERE rn = 1
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q84: sliding-window approximate distinct — trailing-6h distinct
  // users at every hour, the always-on dashboard counter, served by the
  // KMV sketch instead of exact per-window sets: q17's sliding-window
  // fan-out (each event lands in the 6 trailing windows that contain
  // it) feeding q11c's bounded-state kmv_distinct aggregate. Per-window
  // state is O(k) REGARDLESS of user cardinality — the 100 TB shape;
  // exact windowed distinct carries O(users) per window and q70's
  // first-seen trick only serves cumulative (non-sliding) curves.
  // Windows where the sketch isn't full (n_mins < k) report the EXACT
  // count by construction; beyond that the (k−1)/frac estimator applies
  // — deterministic md5 hashing, so oracle-checkable like q11c/q77.
  // ---------------------------------------------------------------------
  private val WkmvK = 64
  private val WkmvSpanH = 6
  private val WkmvSpace = (1L << 60).toDouble

  def q84WindowedKmv(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Vectors.register(spark)
    val ev = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 3600000000").as("h"),
        PortableHash.h60(col("user_id")).as("hu"))
    ev.withColumn("wend", explode(expr(s"sequence(h, h + ${WkmvSpanH - 1}L)")))
      .groupBy(col("wend"))
      .agg(call_function("kmv_distinct", col("hu"), lit(WkmvK)).as("s"))
      .select(col("wend").as("window_end_h"), col("s.n_mins").as("n_mins"),
        round(col("s.est"), 4).as("est_users"))
      .orderBy(col("window_end_h"))
  }

  val q84WindowedKmvSql: String =
    s"""WITH ev AS (
       |  SELECT epoch_us(ts) // 3600000000 AS h,
       |    ${PortableHash.h60Sql("user_id")} AS hu
       |  FROM events),
       |fan AS (
       |  SELECT h + o AS wend, hu
       |  FROM ev CROSS JOIN (SELECT unnest(range(0, $WkmvSpanH)) AS o)),
       |hashed AS (SELECT DISTINCT wend, hu FROM fan),
       |ranked AS (
       |  SELECT wend, hu,
       |    ROW_NUMBER() OVER (PARTITION BY wend ORDER BY hu) AS rn
       |  FROM hashed),
       |tops AS (
       |  SELECT wend, COUNT(*) AS n_mins, MAX(hu) AS hk
       |  FROM ranked WHERE rn <= $WkmvK GROUP BY 1)
       |SELECT wend AS window_end_h, n_mins,
       |  ROUND(CASE WHEN n_mins < $WkmvK THEN CAST(n_mins AS DOUBLE)
       |             ELSE ${(WkmvK - 1).toDouble} / (CAST(hk AS DOUBLE) / $WkmvSpace)
       |        END, 4) AS est_users
       |FROM tops
       |ORDER BY window_end_h""".stripMargin

  // ---------------------------------------------------------------------
  // q89: time-to-convert distribution — exact p25/p50/p95 of the
  // last-touch click→purchase latency, the funnel-health metric next to
  // q78's attribution counts: per attributed purchase the delta to its
  // MOST RECENT qualifying click (min over pairs of p_tus − c_tus =
  // p_tus − max(c_tus), exact integer µs; ONE division to seconds), then
  // q19's scale-safe rank-based interpolated quantiles over the
  // conversion-sized delta set — no whole-group value buffer anywhere.
  // Candidate pairs ride q78's two-arm bucket join; the oracle computes
  // the naive interval join + quantile_cont, so both the bucketing AND
  // the rank interpolation are hash-proven against the textbook form.
  // ---------------------------------------------------------------------
  def q89TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus").as("c_tus"),
        expr(s"tus div ${AttrWindowUs}L").as("bucket"))
    val probes = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus").as("p_tus"), col("event_id").as("p_id"))
      .withColumn("bucket",
        explode(array(expr(s"p_tus div ${AttrWindowUs}L"),
          expr(s"p_tus div ${AttrWindowUs}L - 1"))))
    val deltas = probes.join(clicks, Seq("user_id", "bucket"))
      .filter(col("c_tus") >= col("p_tus") - AttrWindowUs &&
        col("c_tus") <= col("p_tus"))
      .groupBy(col("p_id"))
      .agg((min(col("p_tus") - col("c_tus")).cast(DoubleType) / lit(1000000.0))
        .as("delta_s"))
      .withColumn("__g", lit("all"))
    Relational.rankQuantiles(deltas, "__g", "delta_s",
        Seq("p25_s" -> 0.25, "p50_s" -> 0.5, "p95_s" -> 0.95))
      .select(col("__n").as("n_conversions"),
        col("p25_s"), col("p50_s"), col("p95_s"))
  }

  val q89TimeToConvertSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
       |deltas AS (
       |  SELECT p.event_id AS p_id,
       |    CAST(MIN(p.tus - c.tus) AS BIGINT) AS delta_us
       |  FROM e p JOIN e c
       |    ON p.user_id = c.user_id
       |   AND p.event_type = 'purchase' AND c.event_type = 'click'
       |   AND c.tus >= p.tus - $AttrWindowUs AND c.tus <= p.tus
       |  GROUP BY 1)
       |SELECT COUNT(*) AS n_conversions,
       |  ROUND(quantile_cont(CAST(delta_us AS DOUBLE) / 1000000.0, 0.25), 6) AS p25_s,
       |  ROUND(quantile_cont(CAST(delta_us AS DOUBLE) / 1000000.0, 0.5), 6) AS p50_s,
       |  ROUND(quantile_cont(CAST(delta_us AS DOUBLE) / 1000000.0, 0.95), 6) AS p95_s
       |FROM deltas""".stripMargin

  // ---------------------------------------------------------------------
  // q112: Markov removal-effect attribution (Anderl et al.'s
  // absorbing-chain model) — the principled multi-touch sibling of
  // q78's last-touch window join: user paths become a first-order
  // Markov chain over the FIXED channel domain, conversion probability
  // comes from the chain's absorbing states, and each channel's credit
  // is its REMOVAL EFFECT — how much conversion probability disappears
  // when every path through it dies.
  //
  // Path model: per user, events ordered by (ts, event_id), truncated
  // at the FIRST purchase (→ 'conv'); paths without one terminate in
  // 'null'; 'start' precedes the first event.
  //
  // Exactness — NO floating point anywhere in the chain: transition
  // cells are counts, and the value iteration runs on a 1e9 integer
  // grid with v'(s) = ⌊(2·Σ_t c(s,t)·v(t) + tot(s)) / (2·tot(s))⌋ —
  // the round-half-up of the rational update as PURE integer division,
  // replayed with the identical recurrence (HUGEINT) by the oracle's
  // unrolled CTE chain. Removal chains force v(channel) = 0 each
  // round. Doubles appear only in the final ROUND-6 report columns,
  // derived from the exact v9/re9 integers.
  //
  // Scale shape: the corpus-sized work is the per-user path windows
  // (one exchange on user_id — q61's shape) collapsing to a transition
  // matrix BOUNDED BY THE STATE DOMAIN (≤ (|channels|+2)² = 36 cells,
  // data-independent). The collect of that matrix is the
  // bounded-cardinality class the plan audit allows (|strata|-row
  // precedent); the (1+|channels|) × 16-round iteration is driver
  // arithmetic on ≤ 7 integers per round at ANY corpus size.
  // ---------------------------------------------------------------------
  private val AttrChannels = Seq("click", "error", "signup", "view")

  /** Shapley permutation weights |S|!·(k−1−|S|)! by coalition size, and
    * the k! divisor, DERIVED from the channel count — with k = 4 these
    * are {6,2,2,6} and 24, but deriving them means a future channel-list
    * edit cannot silently keep 4-channel constants while both engines
    * agree on the same wrong values (ADVICE r12).
    */
  private def factorial(n: Int): Long = (1 to n).foldLeft(1L)(_ * _.toLong)
  private val AttrPermW: IndexedSeq[Long] = (0 until AttrChannels.length)
    .map(s => factorial(s) * factorial(AttrChannels.length - 1 - s))
  private val AttrFactK: Long = factorial(AttrChannels.length)
  private val MarkovIters = 16
  private val V9One = 1000000000L

  /** The (src, dst, c) transition matrix of the q112 path model — spec
    * entry point (state-domain-bounded output).
    */
  private[graft] def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val ranked = e.withColumn("rk", row_number().over(w))
    val pRank = ranked.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("rk")).as("prk"))
    val kept = ranked.join(pRank, Seq("user_id"), "left")
      .filter(col("prk").isNull || col("rk") <= col("prk"))
      .withColumn("state",
        when(col("event_type") === "purchase", "conv").otherwise(col("event_type")))
    val pairs = kept
      .withColumn("src", coalesce(lag(col("state"), 1).over(w), lit("start")))
      .select(col("src"), col("state").as("dst"))
    val tails = kept.filter(col("prk").isNull)
      .withColumn("mx", max(col("rk")).over(Window.partitionBy(col("user_id"))))
      .filter(col("rk") === col("mx"))
      .select(col("state").as("src"), lit("null").as("dst"))
    pairs.union(tails).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("c"))
  }

  def q112MarkovAttribution(spark: SparkSession, dir: String): DataFrame = {
    val tm = markovTransitions(spark, dir)
    // bounded collect: ≤ 36 cells by the state domain (see header)
    val cells = tm.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val transient = "start" +: AttrChannels

    def converge(removed: Option[String]): Long = {
      var v = Map("conv" -> V9One, "null" -> 0L) ++ transient.map(_ -> 0L)
      for (_ <- 1 to MarkovIters) {
        v = v ++ transient.map { s =>
          val v9 =
            if (removed.contains(s) || !tot.contains(s)) 0L
            else {
              val num = v.map { case (t, vt) =>
                BigInt(cells.getOrElse((s, t), 0L)) * vt
              }.sum
              ((2 * num + tot(s)) / (2 * BigInt(tot(s)))).toLong
            }
          s -> v9
        }.toMap
      }
      v("start")
    }

    val v9f = converge(None)
    val rows = AttrChannels.map(ch => (ch, v9f, converge(Some(ch))))
    val s = spark; import s.implicits._
    val re9 = when(col("v9f") > 0L,
      expr(s"(2 * (v9f - v9r) * ${V9One}L + v9f) div (2 * v9f)")).otherwise(0L)
    rows.toDF("channel", "v9f", "v9r")
      .withColumn("re9", re9)
      .withColumn("sum_re9", sum(col("re9")).over(Window.partitionBy()))
      .select(col("channel"),
        round(col("v9f").cast(DoubleType) / lit(1e9), 6).as("p_conv"),
        round(col("v9r").cast(DoubleType) / lit(1e9), 6).as("p_removed"),
        round(col("re9").cast(DoubleType) / lit(1e9), 6).as("removal_effect"),
        when(col("sum_re9") > 0L,
          round(col("re9").cast(DoubleType) / col("sum_re9").cast(DoubleType), 6))
          .otherwise(lit(0.0)).as("attribution"))
      .orderBy(col("channel"))
  }

  // ---------------------------------------------------------------------
  // q118: Shapley-value attribution (Shapley 1953; the game-theoretic
  // multi-touch model of Zhao et al. 2018, "Shapley Value Methods for
  // Attribution Modeling") — q112's axiomatic sibling: instead of a
  // Markov removal effect, each channel gets its average marginal
  // contribution over all orderings of the channel coalition. Coalition
  // worth v(S) = converted users whose pre-conversion channel SET ⊆ S.
  //
  // Exactness: channel sets are bitmasks (SUM(DISTINCT 1<<i) per user),
  // v(S) is an integer subset-sum over the ≤16-row exact-set table, and
  // with |N| = 4 the permutation weights |S|!·(3−|S|)! ∈ {6,2,2,6} put
  // every Shapley value on an exact 1/24 integer grid (phi24) — zero
  // floating point until the two ROUND-6 report columns. The efficiency
  // axiom Σφ = v(N) − v(∅) holds EXACTLY on that grid (spec-pinned).
  //
  // Scale shape: corpus-sized work is one user-keyed window pass (the
  // q61/q112 exchange) + one hash aggregate to ≤16 mask rows; the
  // subset-sum, the 4×8 marginal table and the phi aggregation are all
  // domain-bounded (2^|channels|), data-independent.
  // ---------------------------------------------------------------------
  def q118ShapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val ranked = e.withColumn("rk", row_number().over(w))
    val pRank = ranked.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("rk")).as("prk"))
    val chanIdx = AttrChannels.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (ch, i)) => when(col("event_type") === ch, lit(i)).otherwise(acc)
    }
    val touches = ranked.join(pRank, Seq("user_id"), "inner") // converted users only
      .filter(col("rk") < col("prk"))
      .filter(col("event_type").isin(AttrChannels: _*))
      .select(col("user_id"), chanIdx.as("i"))
    val masks = touches.groupBy(col("user_id"))
      .agg(sum_distinct(expr("shiftleft(CAST(1 AS BIGINT), i)")).as("mask"))
    // every converter contributes a mask row — touchless ones as ∅
    val r = pRank.join(masks, Seq("user_id"), "left")
      .select(coalesce(col("mask"), lit(0L)).as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("r"))
    val subsets = spark.range(1 << AttrChannels.length)
      .select(col("id").cast(LongType).as("s"))
    val v = subsets.join(broadcast(r), expr("(mask & s) = mask"), "left")
      .groupBy(col("s")).agg(coalesce(sum(col("r")), lit(0L)).as("v"))
    val s2 = spark
    import s2.implicits._
    val chan = AttrChannels.zipWithIndex.toDF("channel", "i")
    val marg = chan
      .join(v.select(col("s"), col("v").as("v_s")), expr("(s & shiftleft(CAST(1 AS BIGINT), i)) = 0"))
      .join(v.select(col("s").as("si"), col("v").as("v_si")),
        expr("si = (s | shiftleft(CAST(1 AS BIGINT), i))"))
      .withColumn("w24",
        AttrPermW.zipWithIndex.foldLeft(lit(0L): org.apache.spark.sql.Column) {
          case (acc, (wt, sz)) =>
            when(expr("bit_count(s)") === lit(sz), lit(wt)).otherwise(acc)
        })
    val phi = marg.groupBy(col("channel"))
      .agg(sum(col("w24") * (col("v_si") - col("v_s"))).as("phi24"))
      .withColumn("tot24", sum(col("phi24")).over(Window.partitionBy()))
    phi.select(col("channel"),
        round(col("phi24") / lit(AttrFactK.toDouble), 6).as("shapley"),
        when(col("tot24") > 0L,
          round(col("phi24").cast(DoubleType) / col("tot24").cast(DoubleType), 6))
          .otherwise(lit(0.0)).as("share"))
      .orderBy(col("channel"))
  }

  val q118ShapleyAttributionSql: String = {
    val chanCase = AttrChannels.zipWithIndex
      .map { case (ch, i) => s"WHEN '$ch' THEN $i" }.mkString(" ")
    val chanRows = AttrChannels.zipWithIndex
      .map { case (ch, i) => s"('$ch', $i)" }.mkString(", ")
    val wCase = AttrPermW.zipWithIndex
      .map { case (wt, sz) => s"WHEN $sz THEN $wt" }.mkString(" ")
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rk
       |  FROM e),
       |pr AS (SELECT user_id, MIN(rk) AS prk FROM rk WHERE event_type = 'purchase' GROUP BY 1),
       |touch AS (
       |  SELECT rk.user_id, CASE event_type $chanCase END AS i
       |  FROM rk JOIN pr USING (user_id)
       |  WHERE rk.rk < prk AND event_type IN (${AttrChannels.map(c => s"'$c'").mkString(", ")})),
       |masks AS (
       |  SELECT user_id, CAST(SUM(DISTINCT (1::BIGINT << i)) AS BIGINT) AS mask
       |  FROM touch GROUP BY 1),
       |r AS (
       |  SELECT COALESCE(mask, 0) AS mask, COUNT(*) AS r
       |  FROM pr LEFT JOIN masks USING (user_id) GROUP BY 1),
       |s AS (SELECT unnest(range(0, ${1 << AttrChannels.length})) AS s),
       |v AS (
       |  SELECT s.s, CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS v
       |  FROM s LEFT JOIN r ON (r.mask & s.s) = r.mask GROUP BY s.s),
       |ch(channel, i) AS (VALUES $chanRows),
       |m AS (
       |  SELECT channel,
       |    v0.v AS v_s, v1.v AS v_si,
       |    CASE bit_count(v0.s) $wCase END AS w24
       |  FROM ch
       |  JOIN v v0 ON (v0.s & (1::BIGINT << i)) = 0
       |  JOIN v v1 ON v1.s = (v0.s | (1::BIGINT << i))),
       |phi AS (
       |  SELECT channel, CAST(SUM(w24 * (v_si - v_s)) AS BIGINT) AS phi24 FROM m GROUP BY 1),
       |tot AS (SELECT CAST(SUM(phi24) AS BIGINT) AS tot24 FROM phi)
       |SELECT channel,
       |  ROUND(phi24 / $AttrFactK.0, 6) AS shapley,
       |  CASE WHEN tot24 > 0
       |       THEN ROUND(CAST(phi24 AS DOUBLE) / CAST(tot24 AS DOUBLE), 6)
       |       ELSE 0.0 END AS share
       |FROM phi, tot
       |ORDER BY channel""".stripMargin
  }

  val q112MarkovAttributionSql: String = {
    val states = ("start" +: AttrChannels) ++ Seq("conv", "null")
    val stateRows = states.map(s => s"SELECT '$s' AS state").mkString(" UNION ALL ")
    def chain(tag: String, removed: Option[String]): String = {
      val v0 = states.map(s =>
        s"SELECT '$s' AS state, CAST(${if (s == "conv") V9One else 0L} AS HUGEINT) AS v9")
        .mkString(" UNION ALL ")
      val iters = (1 to MarkovIters).map { k =>
        val prev = s"v_${tag}_${k - 1}"
        val removedCase = removed.map(r => s"WHEN s.state = '$r' THEN 0").getOrElse("")
        // MATERIALIZED is load-bearing (the t98 lesson, TextOps
        // bpeBudgetStagesSql): without it DuckDB re-inlines the shared
        // tm/tot subtree into every one of the 85 chained stages —
        // measured 716.6s for this one oracle at sf0.01; with it, 0.8s,
        // identical rows (VERDICT r16 item 1).
        s"""v_${tag}_$k AS MATERIALIZED (
           |  SELECT s.state,
           |    CAST(CASE WHEN s.state = 'conv' THEN $V9One
           |         WHEN s.state = 'null' THEN 0
           |         $removedCase
           |         WHEN t.tot IS NULL THEN 0
           |         ELSE (2 * COALESCE(n.num, 0) + t.tot) // (2 * t.tot)
           |    END AS HUGEINT) AS v9
           |  FROM states s
           |  LEFT JOIN tot t ON t.src = s.state
           |  LEFT JOIN (
           |    SELECT tm.src, SUM(CAST(tm.c AS HUGEINT) * v.v9) AS num
           |    FROM tm JOIN $prev v ON v.state = tm.dst GROUP BY 1) n
           |    ON n.src = s.state)""".stripMargin
      }
      s"v_${tag}_0 AS MATERIALIZED ($v0),\n${iters.mkString(",\n")}"
    }
    val chains = chain("f", None) +: AttrChannels.map(ch => chain(s"r$ch", Some(ch)))
    val resRows = AttrChannels.map(ch =>
      s"""SELECT '$ch' AS channel,
         |  (SELECT v9 FROM v_f_$MarkovIters WHERE state = 'start') AS v9f,
         |  (SELECT v9 FROM v_r${ch}_$MarkovIters WHERE state = 'start') AS v9r""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rk
       |  FROM e),
       |pr AS (SELECT user_id, MIN(rk) AS prk FROM rk WHERE event_type = 'purchase' GROUP BY 1),
       |kept AS (
       |  SELECT rk.*, prk,
       |    CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS state
       |  FROM rk LEFT JOIN pr USING (user_id)
       |  WHERE prk IS NULL OR rk.rk <= prk),
       |pairs AS (
       |  SELECT COALESCE(LAG(state) OVER (PARTITION BY user_id ORDER BY tus, event_id),
       |    'start') AS src, state AS dst
       |  FROM kept),
       |tails AS (
       |  SELECT state AS src, 'null' AS dst FROM (
       |    SELECT *, MAX(rk) OVER (PARTITION BY user_id) AS mx
       |    FROM kept WHERE prk IS NULL)
       |  WHERE rk = mx),
       |tm AS MATERIALIZED (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT * FROM pairs UNION ALL SELECT * FROM tails) GROUP BY 1, 2),
       |tot AS MATERIALIZED (SELECT src, CAST(SUM(c) AS BIGINT) AS tot FROM tm GROUP BY 1),
       |states AS MATERIALIZED ($stateRows),
       |${chains.mkString(",\n")},
       |res AS (
       |$resRows),
       |scored AS (
       |  SELECT *, CASE WHEN v9f > 0
       |    THEN (2 * (v9f - v9r) * $V9One + v9f) // (2 * v9f) ELSE 0 END AS re9
       |  FROM res),
       |t2 AS (SELECT *, SUM(re9) OVER () AS sum_re9 FROM scored)
       |SELECT channel,
       |  ROUND(CAST(v9f AS DOUBLE) / 1e9, 6) AS p_conv,
       |  ROUND(CAST(v9r AS DOUBLE) / 1e9, 6) AS p_removed,
       |  ROUND(CAST(re9 AS DOUBLE) / 1e9, 6) AS removal_effect,
       |  CASE WHEN sum_re9 > 0
       |    THEN ROUND(CAST(re9 AS DOUBLE) / CAST(sum_re9 AS DOUBLE), 6)
       |    ELSE 0.0 END AS attribution
       |FROM t2
       |ORDER BY channel""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q112_markov_attribution", q112MarkovAttribution _, q112MarkovAttributionSql),
    QueryDef.sql("q118_shapley_attribution", q118ShapleyAttribution _, q118ShapleyAttributionSql),
    QueryDef.sql("q16_session_window", q16SessionWindow _, q16SessionWindowSql),
    QueryDef.sql("q17_sliding_window", q17SlidingWindow _, q17SlidingWindowSql),
    QueryDef.sql("q37_stream_join_shape", q37StreamJoinShape _, q37StreamJoinShapeSql),
    QueryDef.sql("q39_funnel", q39Funnel _, q39FunnelSql),
    QueryDef.sql("q45_transitions", q45Transitions _, q45TransitionsSql),
    QueryDef.sql("q46_retention", q46Retention _, q46RetentionSql),
    QueryDef.sql("q52_gapfill", q52GapFill _, q52GapFillSql),
    QueryDef.sql("q60_ohlc_bars", q60OhlcBars _, q60OhlcBarsSql),
    QueryDef.sql("q61_path_mining", q61PathMining _, q61PathMiningSql),
    QueryDef.sql("q64_rolling_anomaly", q64RollingAnomaly _, q64RollingAnomalySql),
    QueryDef.sql("q65_ewma", q65Ewma _, q65EwmaSql),
    QueryDef.sql("q70_running_distinct", q70RunningDistinct _, q70RunningDistinctSql),
    QueryDef.sql("q75_autocorr", q75Autocorr _, q75AutocorrSql),
    QueryDef.sql("q76_session_summary", q76SessionSummary _, q76SessionSummarySql),
    QueryDef.sql("q78_attribution_join", q78AttributionJoin _, q78AttributionJoinSql),
    QueryDef.sql("q80_crosscorr", q80CrossCorr _, q80CrossCorrSql),
    QueryDef.sql("q81_changepoint", q81Changepoint _, q81ChangepointSql),
    QueryDef.sql("q84_windowed_kmv", q84WindowedKmv _, q84WindowedKmvSql),
    QueryDef.sql("q89_time_to_convert", q89TimeToConvert _, q89TimeToConvertSql),
  )
}
