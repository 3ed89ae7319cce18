package graft.streaming

import graft.cdc.{BinlogFsm, CdcConfig, CdcJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC (SURVEY.md §3.4 streaming variant): watch a binlog
  * drop directory, parse each arriving file with the same FSM as the
  * batch path, render, and hand ordered micro-batches to a sink
  * callback (`foreachBatch` — e.g. apply to a target DB, append to a
  * log). One file = one complete ordered unit, matching binlog
  * rotation, so per-file parse needs no cross-batch state.
  */
object CdcStream {

  /** Streaming change-event frame from a drop directory.
    * `maxFilesPerTrigger` is the batching grain: 1 = one rotated file
    * per micro-batch (the c10 incremental-fold scenario), default 32
    * bounds a catch-up burst. */
  def events(spark: SparkSession, dir: String,
      includeDdl: Boolean = false,
      maxFilesPerTrigger: Int = 32): DataFrame = {
    import spark.implicits._
    CdcJob.projectEvents(
      spark.readStream
        .option("wholetext", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .text(dir)
        .select(input_file_name().as("file"), col("value"))
        .as[(String, String)]
        .flatMap { case (file, text) =>
          BinlogFsm.parse(file, text.linesIterator, includeDdl)
        }
        .toDF())
  }

  /** Start the pipeline; each micro-batch arrives at `sink` rendered
    * and ordered (file, seq). */
  def start(spark: SparkSession, dir: String, catalog: DataFrame,
      cfg: CdcConfig = CdcConfig(), checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val evs = CdcJob.applyFilters(events(spark, dir, cfg.includeDdl), cfg)
    evs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // cacheBeforeSort=false: a cache entry per micro-batch would
        // never be unpersisted and leak for the stream's lifetime
        sink(CdcJob.render(batch, catalog, cfg, cacheBeforeSort = false), id)
      }
      .start()
  }
}
