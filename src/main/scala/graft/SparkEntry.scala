package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Operator modules each expose `defs: Seq[QueryDef]`; this object flattens
  * them into the `queries` / `oracleSql` maps the driver consumes.
  */
object SparkEntry {
  /** All operator modules contributing queries. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ EventWindows.defs ++ StatsOps.defs ++ Dedup.defs ++
      Similarity.defs ++ TextOps.defs ++ Multimodal.defs ++ Curation.defs ++
      AsOfJoin.defs ++ Sampling.defs ++ TypedOps.defs ++ Graph.defs ++
      Audits.defs ++ Temporal.defs ++ Storage.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
