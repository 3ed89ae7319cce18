package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC: tail a rotating binlog directory with Structured
  * Streaming — a capability the reference cannot express at all (it
  * shells out to mysqlbinlog once, batch-only; main.py:90). Each newly
  * rotated file becomes micro-batch input; a file parses through the
  * SAME FSM, filter set, catalog join, and SQL renderer as the batch
  * path (`CdcJob.projectEvents` / `applyFilters` / `renderUnordered`
  * are shared, so the two paths cannot drift).
  *
  * Semantics: the file is the parallelism AND ordering unit — the
  * whole pipeline is stateless per file (flatMap + stream-static
  * broadcast join), so append mode needs no watermark and no state
  * store. Rows carry (file, seq) for sinks that need total order; a
  * GLOBAL sort is undefined on an unbounded stream, which is also why
  * flashback (a full-stream reversal) is batch-only and rejected here.
  *
  * At scale: binlogs rotate at a fixed size, so arrival rate is files/
  * minute and each micro-batch parses its new files in parallel; the
  * catalog is a broadcast dimension exactly as in batch.
  */
object CdcStream {

  /** Rendered SQL as an unbounded append stream over `dir`.
    * Start with `.writeStream` (any append sink); order within a file
    * is emission order, cross-file order = the `file` column. */
  def changes(spark: SparkSession, dir: String, catalog: DataFrame,
      cfg: CdcConfig = CdcConfig()): DataFrame = {
    require(!cfg.flashback,
      "flashback reverses the whole stream and needs its end: batch-only " +
        "(CdcJob.run); a stream has no final event to start from")
    import spark.implicits._
    val parsed = CdcJob.projectEvents(
      spark.readStream
        .option("wholetext", "true")
        .text(dir)
        .select(input_file_name().as("file"), col("value"))
        .as[(String, String)]
        .flatMap { case (file, text) =>
          BinlogFsm.parse(file, text.linesIterator, cfg.includeDdl)
        }
        .toDF())
    CdcJob.renderUnordered(CdcJob.applyFilters(parsed, cfg), catalog, cfg)
  }
}
