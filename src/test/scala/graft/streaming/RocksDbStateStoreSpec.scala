package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The stateful streaming surface under the RocksDB state store.
  *
  * The default HDFS-backed provider keeps every key's state on the
  * executor HEAP — fine at test scale, a hard ceiling for a 100 TB
  * stream whose join/dedup state outgrows memory. RocksDB keeps state
  * off-heap in a local on-disk LSM (bounded by executor DISK, with
  * snapshot + changelog files in the checkpoint for recovery), which
  * is the provider a production deployment of these operators would
  * run. Wiring is ONE session conf
  * (`spark.sql.streaming.stateStore.providerClass`) — the operators
  * themselves are provider-agnostic, and this spec pins that: every
  * oracle-backed stateful stream entry (keep-first dedup s7/s10,
  * stream-stream inner/outer/full joins s12/s13/s20) produces the
  * SAME canonical hash under both providers, and the RocksDB session
  * demonstrably engages the provider (rocksdb custom metrics in the
  * query progress).
  */
class RocksDbStateStoreSpec extends AnyFunSuite {

  private lazy val base: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val Entries = Seq(
    "s7_preprocess_stream", // keep-first dedup over the document stream
    "s10_delta_dedup_stream", // bloom-gated delta dedup
    "s12_stream_join", // stream-stream inner join
    "s13_stream_outer_join", // left-outer with watermark nulls
    "s20_stream_full_outer") // full-outer, both flush directions

  test("RocksDB provider engages and exposes its metrics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rocks = base.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass", RocksProvider)
    implicit val ctx: org.apache.spark.sql.SQLContext = rocks.sqlContext
    import rocks.implicits._
    val in = MemoryStream[Int]
    val q = in.toDF().dropDuplicates("value")
      .writeStream.format("memory").queryName("rocks_probe")
      .outputMode("append").start()
    try {
      in.addData(1 to 100)
      q.processAllAvailable()
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty)
      val metrics = ops.head.customMetrics.keySet()
      assert(metrics.toString.contains("rocksdb"),
        s"expected rocksdb custom metrics, got $metrics")
    } finally {
      q.stop()
      rocks.catalog.dropTempView("rocks_probe")
    }
  }

  test("stateful stream entries hash identically under heap and RocksDB state stores") {
    val sf = "/root/testdata/sf0.001"
    val heap = base.newSession()
    val rocks = base.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass", RocksProvider)
    for (name <- Entries) {
      val a = graft.GoldenHashes.hashOf(graft.SparkEntry.queries(name)(heap, sf))
      val b = graft.GoldenHashes.hashOf(graft.SparkEntry.queries(name)(rocks, sf))
      assert(a == b, s"$name: heap hash $a != rocksdb hash $b")
    }
  }
}
