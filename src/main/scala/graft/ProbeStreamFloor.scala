package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev scratch (r16, guide §1): per-micro-batch duration breakdown for
  * the streaming SCENARIO entries, from StreamingQueryProgress — where
  * does a stream-stream join's ~1 s/batch actually go (triggerExecution
  * vs queryPlanning vs addBatch vs getBatch vs walCommit vs
  * commitOffsets vs state-store commit)? Drives the s12/s13/s20/s22
  * micro-batch-floor work (VERDICT r15 item 3). Also reports total
  * entry wall and the feed-side (collect+encode) share.
  *
  * Args: scenario entry names (e.g. s12_stream_join). Env knobs:
  *   PROBE_PROVIDER=rocksdb  — RocksDB state store for the run
  *   PROBE_PARTS=<n>         — spark.sql.shuffle.partitions (default 8)
  *   SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR as usual.
  * Not part of the driver contract.
  */
object ProbeStreamFloor {
  def main(args: Array[String]): Unit = {
    val parts = sys.env.getOrElse("PROBE_PARTS", "8")
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
    val b2 =
      if (sys.env.get("PROBE_PROVIDER").contains("rocksdb"))
        b.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else b
    val spark =
      (if (sys.env.get("PROBE_RAWFS").contains("1"))
        b2.config("spark.hadoop.fs.file.impl",
          "org.apache.hadoop.fs.RawLocalFileSystem")
      else b2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // collect every progress event; key durations per batch
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        progress.add(e.progress); ()
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val reps = sys.env.getOrElse("PROBE_REPS", "2").toInt
    for (n <- args) {
      val fn = SparkEntry.queries(n)
      fn(spark, d).count() // warm
      spark.catalog.clearCache()
      for (r <- 1 to reps) {
        progress.clear()
        val t0 = System.nanoTime()
        val cnt = fn(spark, d).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val ps = progress.asScala.toSeq
        val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
          "latestOffset", "addBatch", "walCommit", "commitOffsets")
        val sums = keys.map { k =>
          k -> ps.map(p => Option(p.durationMs.get(k)).map(_.longValue)
            .getOrElse(0L)).sum
        }
        val stateRows = ps.flatMap(_.stateOperators.map(_.numRowsTotal)).sum
        val updMs = ps.flatMap(_.stateOperators.map(_.allUpdatesTimeMs)).sum
        val rmMs = ps.flatMap(_.stateOperators.map(_.allRemovalsTimeMs)).sum
        val cmMs = ps.flatMap(_.stateOperators.map(_.commitTimeMs)).sum
        println(f"$n rep$r wall=$wall%6.2fs rows=$cnt batches=${ps.size}%3d " +
          sums.map { case (k, v) => s"$k=${v}ms" }.mkString(" ") +
          s" stateUpd=${updMs}ms stateRm=${rmMs}ms stateCommit=${cmMs}ms " +
          s"stateRowsTot=$stateRows")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
