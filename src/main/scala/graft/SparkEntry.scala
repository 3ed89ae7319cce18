package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CdcQueries, CorpusPipeline, DedupOps, EventOps,
  GraphOps, MultimodalOps, Relational, SimilarityOps, SourceOps,
  StorageOps, StreamingQueries, TextAnalysis, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-surface modules in
  * `graft.queries`; each `QueryDef` pairs the Spark plan with its
  * DuckDB oracle SQL (when SQL-expressible).
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    Relational.defs ++ EventOps.defs ++ StreamingQueries.defs ++
      TextOps.defs ++ CdcQueries.defs ++ TextAnalysis.defs ++
      DedupOps.defs ++ SimilarityOps.defs ++ MultimodalOps.defs ++
      CorpusPipeline.defs ++ StorageOps.defs ++ SourceOps.defs ++
      GraphOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
