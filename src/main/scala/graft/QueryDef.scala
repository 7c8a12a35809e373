package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark query
  * builder plus (when SQL-expressible) the equivalent DuckDB oracle SQL.
  * `oracle = None` → the driver records a weaker rows-only check; such
  * queries get their semantics pinned by ScalaTest specs instead.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String, fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
