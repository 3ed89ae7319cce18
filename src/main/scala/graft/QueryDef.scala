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
    * twice. Oracle/report outputs that are BOUNDED (per-group aggregates
    * over low-cardinality keys, top-k) are at most thousands of rows, so
    * shuffling them to one partition and sorting there gives the same
    * total order with a single upstream pass.
    *
    * `orderedRows` is for outputs whose row count SCALES with the corpus
    * (per-row projections, per-pair dedup results): a parallel range
    * sort — at 100× the data, funneling every result row through one
    * task would be the bottleneck, while range partitions keep the sort
    * distributed.
    */
  implicit final class SmallOrdered(private val df: org.apache.spark.sql.DataFrame)
      extends AnyVal {
    // coalesce(1), not repartition(1): a narrow merge of the (tiny)
    // final-aggregate partitions costs no extra exchange/stage, while
    // repartition(1) adds a whole shuffle round just to order rows.
    // The final stage runs single-task either way — fine, the input is
    // bounded by contract.
    def orderedSmall(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
      df.coalesce(1).sortWithinPartitions(cols: _*)
    def orderedRows(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
      df.orderBy(cols: _*)

    /** Redistribute a frame whose plan yields far fewer input slices
      * than the session has cores, so heavy per-row kernels (shingling,
      * MinHash, trigram explosion) downstream run partition-parallel.
      * Single-row-group parquet — the bench corpus layout — decodes as
      * ONE task and would otherwise serialize everything pipelined onto
      * it. At real scale scans already split by row group/file and this
      * is a no-op decision; the guard (4× headroom) keeps it from
      * inserting a shuffle into an already-parallel plan.
      *
      * The slice count is ESTIMATED from the analyzed plan's file
      * sources (bytes / maxPartitionBytes, the scan-split formula sans
      * open-cost padding — conservative in the same direction as
      * Spark's packing): computing it from `df.rdd` would physically
      * plan the frame a second time per call, a measured fixed tax on
      * every query that fans out. Non-file leaves (test frames) fall
      * back to the RDD path. */
    def fanOut: org.apache.spark.sql.DataFrame = {
      val sc = df.sparkSession.sparkContext
      val slices = QueryDef.estimatedScanSlices(df)
      if (slices * 4 <= sc.defaultParallelism)
        df.repartition(sc.defaultParallelism)
      else df
    }

    // (A keyed fanOutBy variant existed in r5 for q04; A/B at both
    // local[8] and local[32] showed map-side combine beats raw-row
    // redistribution at every measured width, so it was removed.)
  }

  /** Estimated input-slice count of `df`'s scan(s): Σ over file-backed
    * leaves of ceil(bytes / maxPartitionBytes). Falls back to physical
    * partition count when any leaf is not a file relation. */
  private[graft] def estimatedScanSlices(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes.max(1L)
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val fileLeaves = leaves.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes
    }
    if (fileLeaves.size == leaves.size)
      fileLeaves.map(b => ((b + maxSplit - 1) / maxSplit).toInt.max(1)).sum
    else df.rdd.getNumPartitions
  }
}
