package graft.streaming

import graft.cdc.{BinlogFsm, CdcConfig, CdcJob, SchemaEvolve}
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

  /** `--evolve-schema` for the LONG-RUNNING stream (the batch-only gap
    * VERDICT r13 named first): an ALTER arriving mid-directory must
    * version the catalog for every LATER row event — including events
    * in later micro-batches — exactly as `CdcJob.run`'s positioned
    * timelines do over the full log (c15, fixing the reference's
    * live-catalog defect, log2sql.py:29-46).
    *
    * State model (the c10 stamped-state pattern, driver-sized): the
    * base catalog folds to `base` ONCE; each micro-batch collects its
    * own (bounded, human-issued) DDL events into an accumulator, and
    * the timelines are RE-FOLDED from (base, all DDL so far) — foldDdls
    * sorts by (file, seq) internally, so arrival order (rotation
    * order, catch-up bursts, replays) cannot change the result, and a
    * row event always resolves at ITS position even when its file
    * arrives after a later file's ALTER. Per-batch rows then render
    * against the batch's timeline snapshot. Within one batch the
    * position probe (`colsAt`: last version strictly before the row)
    * already orders same-batch ALTERs against same-batch rows.
    *
    * The parse always includes DDL (the timeline must SEE schema
    * history even when the user's output excludes it — same rule as
    * the batch path); `cfg.includeDdl` only controls the output.
    *
    * At scale: the accumulator grows with DDL statements only —
    * thousands per log era against billions of row events (the
    * SchemaEvolve contract) — so driver state is bounded and the
    * per-batch refold is noise next to the batch's parse.
    *
    * Ordering contract: an already-emitted batch is immutable (any
    * append-only stream), so a file whose rows PRECEDE an
    * as-yet-unseen file's ALTER must arrive before it. Binlog rotation
    * guarantees exactly that — file N closes before N+1 exists, and
    * the file-stream source discovers in modification-time order. A
    * genuinely late out-of-order file still folds its DDL correctly
    * for every later batch (foldDdls is arrival-order-commutative and
    * colsAt position-resolves), only rows ALREADY emitted keep their
    * at-emission schema.
    *
    * `sink` must materialize its frame within the callback (the batch
    * is cached for the callback's scope and unpersisted after). */
  def startEvolved(spark: SparkSession, dir: String, catalog: DataFrame,
      cfg: CdcConfig = CdcConfig(), checkpoint: String,
      maxFilesPerTrigger: Int = 32)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    startEvolvedFrom(spark,
      events(spark, dir, includeDdl = true, maxFilesPerTrigger),
      catalog, cfg, checkpoint)(sink)

  /** [[startEvolved]] over a RAW `.binlog` drop directory — the
    * binary-source twin (decode via `sources.BinlogBinary`, same
    * timeline state machine and render). */
  def startEvolvedBinary(spark: SparkSession, dir: String,
      catalog: DataFrame, cfg: CdcConfig = CdcConfig(), checkpoint: String,
      maxFilesPerTrigger: Int = 32)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import spark.implicits._
    val binarySchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val evs = CdcJob.projectEvents(
      spark.readStream
        .format("binaryFile")
        .schema(binarySchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .load(dir)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .flatMap { case (file, bytes) =>
          graft.sources.BinlogBinary.parseBytes(file, bytes, includeDdl = true)
        }
        .toDF())
    startEvolvedFrom(spark, evs, catalog, cfg, checkpoint)(sink)
  }

  private def startEvolvedFrom(spark: SparkSession, evs: DataFrame,
      catalog: DataFrame, cfg: CdcConfig, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(!cfg.flashback,
      "flashback reverses the whole stream and needs its end: batch-only")
    val base = SchemaEvolve.baseOf(catalog)
    val ddlAcc = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, String, String)]
    // filters apply INSIDE the batch callback, after the DDL collect:
    // the timeline folds over the PRE-filter stream — user filters
    // narrow the output, never the schema history events resolve
    // against (same rule as CdcJob.run's batch fold)
    evs
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the batch is consumed twice (DDL collect + render): cache for
        // the callback's scope, release before the next trigger
        val b = batch.persist()
        try {
          ddlAcc ++= b.filter(col("op") === "ddl")
            .select(col("file"), col("seq"), col("db"), col("ddl"))
            .collect()
            .map(r => (r.getString(0), r.getLong(1),
              r.getString(2), r.getString(3)))
          val tl = SchemaEvolve.foldDdls(base, ddlAcc.toSeq)
          val filtered = CdcJob.applyFilters(b, cfg)
          val out = if (cfg.includeDdl) filtered
            else filtered.filter(col("op") =!= "ddl")
          sink(CdcJob.renderUnordered(out, catalog, cfg,
            evolved = Some(tl)), id)
        } finally b.unpersist()
      }
      .start()
  }
}
