package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Typed `Dataset[T]` surface — the case-class-Encoder API
  * (`as[T]`, lambda filter, `groupByKey`/`mapGroups`) demonstrated as a
  * first-class, oracle-checked operator rather than a code-style aside.
  *
  * Honest scale note: `groupByKey.mapGroups` shuffles RAW rows and
  * cannot partial-aggregate map-side (the lambda is opaque to
  * Catalyst), so for an aggregation this simple the untyped
  * `groupBy().agg()` form (q36) is strictly cheaper. The typed form is
  * the right tool when per-group logic is genuinely imperative —
  * sequential state machines, early exits, heterogeneous outputs (the
  * fidelity Welford replay in `fidelity/StatefulStats` is the streaming
  * version of exactly that). q44 keeps the group fold ORDER-INSENSITIVE
  * (counts, fixed-point integer sums, min/max) so the result is
  * deterministic under shuffle and hash-comparable cross-engine.
  */
object TypedOps {

  case class Ev(event_type: String, value: Double)

  def q44TypedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_type"), col("value")).as[Ev]
      .filter(_.value > 1.0)
      .groupByKey(_.event_type)
      .mapGroups { (k, it) =>
        var n = 0L
        var s = 0L // cents — the dsum fixed-point discipline, 2 dp grid
        var mn = Double.MaxValue
        var mx = Double.MinValue
        it.foreach { e =>
          n += 1
          s += math.floor(e.value * 100.0 + 0.5).toLong
          mn = math.min(mn, e.value)
          mx = math.max(mx, e.value)
        }
        (k, n, s.toDouble / 100.0, mn, mx)
      }
      .toDF("event_type", "n", "sum_value", "min_value", "max_value")
      .orderBy(col("event_type"))
  }

  val q44TypedStatsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value
      |FROM events
      |WHERE value > 1.0
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q44_typed_stats", q44TypedStats _, q44TypedStatsSql),
  )
}
