package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming STATE scale smoke (VERDICT r11 item 5): drive the
  * stateful streams over a 10× corpus and record, per micro-batch,
  * state-store rows/bytes and wall — the check that watermarks bound
  * state (concurrent keys scale the store linearly; closed windows
  * leave it) and that per-batch wall does not go super-linear.
  *
  *  - s12/s13/s20 (stream-stream joins): MemoryStream feed of the
  *    event table's view/purchase rows in ts order; the 10× corpus
  *    multiplies CONCURRENT keys (user_id offset per copy, same time
  *    range) — the load profile of 10× traffic, where watermark
  *    eviction is what keeps the store finite.
  *  - c10-shape CDC state maintenance: binlog drop-dir stream at
  *    maxFilesPerTrigger=1 folding into stamped state per batch; 10×
  *    = 10× rotated files over the same PK domain (state saturates at
  *    the table size — the bound a lake-state maintainer relies on).
  *
  * Dev scratch, not part of the driver contract.
  */
object ProbeStreamScale {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // c21-shape: per-file micro-batches folding SCD2 open-version
    // state; closed versions are OUTPUT (append-only), not state —
    // the bound claim is openState == live keys however long the log.
    def runScd2Fold(parts: Int): (Long, Long, Double, Int) = {
      val p = graft.cdc.BinlogFixture.materializeDir(
        s"probe_scale_$parts", parts, 1500,
        graft.cdc.BinlogFixture.stressStream)
      var state: Option[DataFrame] = None
      var closed = 0L
      var batches = 0
      val checkpoint = java.nio.file.Files
        .createTempDirectory("graft_probe_scd2_cp").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.CdcStream.events(spark, p, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val (ns, cl) = graft.queries.CdcQueries.scd2Merge(
            state, graft.queries.CdcQueries.flattenImages(batch))
          state = Some(ns.localCheckpoint())
          closed += cl.count()
          batches += 1
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      (state.get.count(), closed, wall, batches)
    }
    def scd2Loop(): Unit =
      for (parts <- Seq(2, 20)) {
        val (open, closedN, wall, n) = runScd2Fold(parts)
        println(f"scd2-fold files=$parts%-3d openState=$open%6d " +
          f"closedEmitted=$closedN%8d wall=$wall%6.1fs batches=$n%3d " +
          f"wall/batch=${wall / n}%5.2fs")
      }
    if (args.contains("scd2only")) { scd2Loop(); spark.stop(); return }

    val src = "/root/testdata/sf0.1"
    val dir10 = "/tmp/graft_sf1_stream"
    if (!new java.io.File(s"$dir10/events.parquet").exists()) {
      val base = spark.read.parquet(s"$src/events.parquet")
      (0 until 10).map { k =>
        if (k == 0) base
        else base
          .withColumn("event_id", col("event_id") + lit(k * 10000000L))
          .withColumn("user_id", col("user_id") + lit(k * 1000000L))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir10/events.parquet")
      println(s"built $dir10/events.parquet")
    }

    def feed(dir: String, nBatches: Int): Seq[Seq[graft.streaming.EventRow]] = {
      val rows = Tables.events(spark, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts", "event_id")
        .collect()
        .map(r => graft.streaming.EventRow(r.getLong(0), r.getTimestamp(1),
          r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      rows.grouped(math.max(1, (rows.length + nBatches - 1) / nBatches))
        .map(_.toSeq).toSeq
    }

    final case class Metrics(rowsOut: Long, maxStateRows: Long,
        maxStateBytes: Long, totalWallMs: Long, batches: Int)

    def runJoin(batches: Seq[Seq[graft.streaming.EventRow]],
        joinType: String): Metrics = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val in = MemoryStream[graft.streaming.EventRow]
      val name = s"probe_scale_${joinType}_${System.nanoTime()}"
      val q = graft.streaming.StreamingOps
        .viewPurchaseJoin(in.toDF(), joinType = joinType)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      var wall = 0L
      try {
        batches.foreach { b =>
          val t0 = System.nanoTime()
          in.addData(b); q.processAllAvailable()
          wall += (System.nanoTime() - t0) / 1000000
        }
      } finally q.stop()
      val progs = q.recentProgress.toSeq
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = progs.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      val out = spark.table(name).count()
      spark.catalog.dropTempView(name)
      Metrics(out, if (stateRows.isEmpty) 0 else stateRows.max,
        if (stateBytes.isEmpty) 0 else stateBytes.max, wall, progs.size)
    }

    println(f"${"entry"}%-28s ${"rows"}%9s ${"stateRows"}%10s ${"stateMB"}%8s ${"wall"}%7s ${"batches"}%7s")
    val results = scala.collection.mutable.Map.empty[(String, String), Metrics]
    for (jt <- Seq("inner", "left_outer", "full_outer");
         (tag, d) <- Seq("1x" -> src, "10x" -> dir10)) {
      val m = runJoin(feed(d, 6), jt)
      results((jt, tag)) = m
      println(f"s-join $jt%-12s $tag%-4s ${m.rowsOut}%9d ${m.maxStateRows}%10d ${m.maxStateBytes / 1e6}%8.1f ${m.totalWallMs / 1000.0}%6.1fs ${m.batches}%7d")
    }
    for (jt <- Seq("inner", "left_outer", "full_outer")) {
      val a = results((jt, "1x")); val b = results((jt, "10x"))
      println(f"ratio $jt%-12s state ${b.maxStateRows.toDouble / a.maxStateRows}%5.1fx  bytes ${b.maxStateBytes.toDouble / a.maxStateBytes}%5.1fx  wall ${b.totalWallMs.toDouble / a.totalWallMs}%5.1fx")
    }

    // r12 stateful shapes: s22 (chained window aggs — TWO state
    // operators bounded by one watermark) and s23 (transformWithState
    // per-user state on RocksDB — state = keys, not events)
    def runPipeline(batches: Seq[Seq[graft.streaming.EventRow]],
        tag: String)(op: DataFrame => DataFrame): Metrics = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val in = MemoryStream[graft.streaming.EventRow]
      val name = s"probe_scale_${tag}_${System.nanoTime()}"
      val mode = if (tag == "tws") "update" else "append"
      val q = op(in.toDF()).writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      var wall = 0L
      try {
        batches.foreach { b =>
          val t0 = System.nanoTime()
          in.addData(b); q.processAllAvailable()
          wall += (System.nanoTime() - t0) / 1000000
        }
      } finally q.stop()
      val progs = q.recentProgress.toSeq
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = progs.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      val out = spark.table(name).count()
      spark.catalog.dropTempView(name)
      Metrics(out, if (stateRows.isEmpty) 0 else stateRows.max,
        if (stateBytes.isEmpty) 0 else stateBytes.max, wall, progs.size)
    }
    def chained(df: DataFrame): DataFrame = df
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(window(col("window"), "30 minutes").as("w30"))
      .agg(count(lit(1)).as("active_buckets"), sum("c").as("n"))
      .select(col("w30.start").as("w30_start"), col("active_buckets"), col("n"))
    def tws(df: DataFrame): DataFrame =
      graft.streaming.StreamingOps.runningStatsTws(
        df.as[graft.streaming.EventRow]).toDF()
    val rocksKey = "spark.sql.streaming.stateStore.providerClass"
    val pipeRes = scala.collection.mutable.Map.empty[(String, String), Metrics]
    for ((tag, d) <- Seq("1x" -> src, "10x" -> dir10)) {
      val mC = runPipeline(feed(d, 6), "chained")(chained)
      pipeRes(("s22-chained", tag)) = mC
      println(f"s22-chained $tag%-7s ${mC.rowsOut}%9d ${mC.maxStateRows}%10d ${mC.maxStateBytes / 1e6}%8.1f ${mC.totalWallMs / 1000.0}%6.1fs ${mC.batches}%7d")
      val prevP = spark.conf.get(rocksKey)
      spark.conf.set(rocksKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val mT = runPipeline(feed(d, 6), "tws")(tws)
        pipeRes(("s23-tws", tag)) = mT
        println(f"s23-tws     $tag%-7s ${mT.rowsOut}%9d ${mT.maxStateRows}%10d ${mT.maxStateBytes / 1e6}%8.1f ${mT.totalWallMs / 1000.0}%6.1fs ${mT.batches}%7d")
      } finally spark.conf.set(rocksKey, prevP)
    }
    for (n <- Seq("s22-chained", "s23-tws")) {
      val a = pipeRes((n, "1x")); val b = pipeRes((n, "10x"))
      println(f"ratio $n%-12s state ${b.maxStateRows.toDouble / a.maxStateRows}%5.1fx  wall ${b.totalWallMs.toDouble / a.totalWallMs}%5.1fx")
    }

    // s24 state bound (VERDICT r13 item 6): dropDuplicatesWithinWatermark
    // vs plain dropDuplicates under a key domain that OUTLIVES the
    // watermark. Dedup key = (user_id, event_type, day): the corpus
    // spans ~30 days, so with a 2-day delay most keys expire long
    // before the stream ends — s24's store should plateau at the keys
    // active within the delay window while plain dropDuplicates
    // accumulates every key ever seen. More batches (24) so the
    // watermark actually advances between adds.
    def dedupKeyed(df: DataFrame): DataFrame = df
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
      .select(col("user_id"), col("event_type"), col("day"))
    def dedupPlain(df: DataFrame): DataFrame = df
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("ts", "2 days")
      .dropDuplicates("user_id", "event_type", "day")
      .select(col("user_id"), col("event_type"), col("day"))
    val dedupRes = scala.collection.mutable.Map.empty[(String, String), Metrics]
    for ((tag, d) <- Seq("1x" -> src, "10x" -> dir10)) {
      val mW = runPipeline(feed(d, 24), "dedup_wm")(dedupKeyed)
      dedupRes(("s24-within-wm", tag)) = mW
      println(f"s24-within-wm $tag%-5s ${mW.rowsOut}%9d ${mW.maxStateRows}%10d ${mW.maxStateBytes / 1e6}%8.1f ${mW.totalWallMs / 1000.0}%6.1fs ${mW.batches}%7d")
      val mP = runPipeline(feed(d, 24), "dedup_plain")(dedupPlain)
      dedupRes(("dropDuplicates", tag)) = mP
      println(f"dropDuplicates $tag%-4s ${mP.rowsOut}%9d ${mP.maxStateRows}%10d ${mP.maxStateBytes / 1e6}%8.1f ${mP.totalWallMs / 1000.0}%6.1fs ${mP.batches}%7d")
      // dedup must stay EXACT despite expiry: within-watermark
      // duplicates are the only kind the ts-ordered feed produces
      println(s"  rowsOut equal: ${mW.rowsOut == mP.rowsOut}" +
        s"  stateRows ratio (plain/wm): ${
          mP.maxStateRows.toDouble / math.max(1, mW.maxStateRows)}")
    }

    // c10-shape: per-file micro-batches folding CDC state
    def runCdcFold(parts: Int): (Long, Long, Double, Int) = {
      val p = graft.cdc.BinlogFixture.materializeDir(
        s"probe_scale_$parts", parts, 1500, graft.cdc.BinlogFixture.stressStream)
      var state: Option[DataFrame] = None
      var batches = 0
      val checkpoint = java.nio.file.Files
        .createTempDirectory("graft_probe_cp").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.CdcStream.events(spark, p, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          state = Some(graft.queries.CdcQueries.mergeState(
            state, graft.queries.CdcQueries.flattenImages(batch))
            .localCheckpoint())
          batches += 1
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val live = graft.queries.CdcQueries.stateView(state.get).count()
      val stateRows = state.get.count()
      (live, stateRows, wall, batches)
    }
    for (parts <- Seq(2, 20)) {
      val (live, total, wall, n) = runCdcFold(parts)
      println(f"cdc-fold files=$parts%-3d live=$live%6d stateRows=$total%7d wall=$wall%6.1fs batches=$n%3d wall/batch=${wall / n}%5.2fs")
    }
    scd2Loop()
    spark.stop()
  }
}
