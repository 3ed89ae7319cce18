package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark query over a scale-factor dir plus an
  * optional DuckDB oracle SQL (SURVEY.md §2.3 t2 contract). Column names
  * and types are aliased identically on both sides — the driver sorts
  * columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
