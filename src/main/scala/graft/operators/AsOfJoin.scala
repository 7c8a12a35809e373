package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Point-in-time (as-of) join — for each left row, the single LATEST
  * right row with `r.ts <= l.ts` on the same key (trade-vs-quote,
  * event-vs-dimension-snapshot, attribution). Spark has no native as-of
  * join; the scale-right formulation is union + one ordered window scan:
  *
  *   tag right rows side=0, left rows side=1; per key, order by
  *   (ts, side) — right first at equal ts, making the bound inclusive —
  *   and carry the last-seen right row forward with
  *   last(…, ignoreNulls) over an unbounded-preceding frame.
  *
  * ONE shuffle on the key and a linear in-partition scan, versus the
  * naive range-join + row_number plan that materializes every candidate
  * (l, r) pair before keeping one — at 100 TB the candidate blow-up of
  * a long-lived key (every trade × every earlier quote) is quadratic,
  * while this stays O(rows). Matches classic time-series engines'
  * merge-join formulation.
  *
  * Precondition for determinism: (key, ts) is unique within each side —
  * a tie inside the right side would make the carried row order-
  * dependent. The events testdata is collision-free (checked at sf0.01
  * and sf0.1); with tie-prone data extend the window ordering with a
  * unique id column.
  */
object AsOfJoin {

  /** Generic as-of: both frames must contain `keyCol` and `tsCol`; the
    * remaining column names must be disjoint between the two sides
    * (pre-rename if not). Output = left.* plus the matched right row's
    * columns (its key/ts excluded — duplicate the right ts under
    * another name before the call if you need it carried). Left rows
    * with no preceding right row carry nulls (left-join semantics).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val lCols = left.columns.filterNot(_ == keyCol).toSeq // includes tsCol
    val rCols = right.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val lStruct = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    val rStruct = right.select(struct(rCols.map(col): _*)).schema.head.dataType
    val lPart = left.select(col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(1).as("_side"), struct(lCols.map(col): _*).as("_lrow"),
      lit(null).cast(rStruct).as("_rrow"))
    val rPart = right.select(col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(0).as("_side"), lit(null).cast(lStruct).as("_lrow"),
      struct(rCols.map(col): _*).as("_rrow"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out: Seq[Column] = (col("_k").as(keyCol) +:
      lCols.map(c => col(s"_lrow.$c").as(c))) ++
      rCols.map(c => col(s"_m.$c").as(c))
    lPart.unionByName(rPart)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(out: _*)
  }

  // ---------------------------------------------------------------------
  // q38: last-touch attribution — for every purchase, the user's most
  // recent click at or before it. -1 sentinels keep the unmatched rows
  // (left semantics) hash-comparable without nullable-int dtype drift.
  // ---------------------------------------------------------------------
  def q38AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    asOf(purchases, clicks, "user_id", "ts")
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_ts_us"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Window-scan mirror of [[asOf]]: same union, same (ts, side)
    * ordering, same IGNORE NULLS carry — not a correlated subquery, so
    * the oracle exercises the identical algorithm.
    */
  val q38AsOfJoinSql: String =
    s"""WITH c AS (
       |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
       |p AS (
       |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
       |u AS (
       |  SELECT user_id, ts, 0 AS side, event_id AS cid, NULL AS pid FROM c
       |  UNION ALL
       |  SELECT user_id, ts, 1 AS side, NULL AS cid, event_id AS pid FROM p),
       |m AS (
       |  SELECT user_id, ts, side, pid,
       |    last_value(cid IGNORE NULLS) OVER
       |      (PARTITION BY user_id ORDER BY ts, side
       |       ROWS UNBOUNDED PRECEDING) AS click_id
       |  FROM u)
       |SELECT pid AS purchase_id, user_id, epoch_us(ts) AS purchase_ts_us,
       |  COALESCE(click_id, -1) AS click_id
       |FROM m WHERE side = 1
       |ORDER BY purchase_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q38_asof_join", q38AsOfJoin _, q38AsOfJoinSql),
  )
}
