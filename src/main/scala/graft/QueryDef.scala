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

  /** Total ordering for SMALL result sets in one pass. A global
    * `orderBy` range-samples its input — the whole upstream plan runs
    * twice. Oracle/report outputs are at most tens of thousands of
    * rows, so shuffling them to one partition and sorting there gives
    * the same total order with a single upstream pass. Not for large
    * outputs — those keep `orderBy` (parallel range sort).
    */
  implicit final class SmallOrdered(private val df: org.apache.spark.sql.DataFrame)
      extends AnyVal {
    def orderedSmall(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }
}
