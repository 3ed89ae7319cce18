package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics via MemoryStream (FIXTURES.md §5): batch
  * equivalence for windows/dedup, the S4 late-data drop golden, and
  * S6 state across micro-batches. */
class StreamingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var n = 0
  private def ev(t: String, userId: Long = 1, eventType: String = "click",
      value: Double = 1.0): EventRow = {
    n += 1
    EventRow(n.toLong, Timestamp.valueOf(t), userId, eventType, value, "{}")
  }

  private def runToMemory(name: String, df: org.apache.spark.sql.DataFrame,
      mode: String, batches: Seq[() => Unit] = Nil,
      stream: Option[MemoryStream[EventRow]] = None,
      data: Seq[Seq[EventRow]] = Nil): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    for (batch <- data) { stream.get.addData(batch); q.processAllAvailable() }
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("S1 streaming tumbling equals batch grouping") {
    val in = MemoryStream[EventRow]
    val rows = Seq(
      ev("2024-01-01 10:05:00", eventType = "click"),
      ev("2024-01-01 10:40:00", eventType = "click"),
      ev("2024-01-01 11:10:00", eventType = "view"))
    val out = runToMemory("s1t", StreamingOps.tumbling(in.toDF()), "append",
      stream = Some(in), data = Seq(rows, Seq(ev("2024-01-01 13:00:00"))))
    // watermark reached 12:50 → both the 10:00 and 11:00 windows closed
    val got = out.select("w", "event_type", "c").as[(Timestamp, String, Long)]
      .collect().toSet
    assert(got == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "view", 1L)))
  }

  test("S4 golden: late row older than watermark is dropped") {
    val in = MemoryStream[EventRow]
    val out = runToMemory("s4t", StreamingOps.tumblingLateDrop(in.toDF()), "append",
      stream = Some(in),
      data = Seq(
        Seq(ev("2024-01-01 10:00:00"), ev("2024-01-01 10:05:00")),
        Seq(ev("2024-01-01 10:30:00")), // advances watermark to 10:20
        Seq(ev("2024-01-01 10:07:00")))) // late: below watermark → dropped
    val got = out.as[(Timestamp, Long)].collect().toMap
    // the finalized 10:00–10:10 window counts 2, not 3
    assert(got(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L)
  }

  test("S3 streaming session windows: 30-min gap splits sessions") {
    val in = MemoryStream[EventRow]
    val out = runToMemory("s3t", StreamingOps.sessions(in.toDF()), "append",
      stream = Some(in),
      data = Seq(
        Seq(ev("2024-01-01 10:00:00", userId = 7), ev("2024-01-01 10:10:00", userId = 7),
          ev("2024-01-01 11:30:00", userId = 7)),
        Seq(ev("2024-01-01 14:00:00", userId = 7)))) // closes both sessions
    val got = out.select("s_start", "n_events").as[(Timestamp, Long)].collect().toMap
    assert(got(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L)
    assert(got(Timestamp.valueOf("2024-01-01 11:30:00")) == 1L)
  }

  test("S5 streaming dedup drops in-watermark duplicate event_ids") {
    val in = MemoryStream[EventRow]
    val dup = ev("2024-01-01 10:00:30")
    val out = runToMemory("s5t", StreamingOps.dedup(in.toDF()), "append",
      stream = Some(in),
      data = Seq(Seq(dup, dup.copy(value = 99.0), ev("2024-01-01 10:01:00"))))
    assert(out.count() == 2)
  }

  test("S6 golden: per-user running counter keeps state across batches") {
    val in = MemoryStream[EventRow]
    val out = runToMemory("s6t",
      StreamingOps.runningCounter(in.toDS()).toDF(), "update",
      stream = Some(in),
      data = Seq(
        Seq(ev("2024-01-01 10:00:00", userId = 1), ev("2024-01-01 10:00:10", userId = 2)),
        Seq(ev("2024-01-01 10:01:00", userId = 1)),
        Seq(ev("2024-01-01 10:02:00", userId = 1), ev("2024-01-01 10:02:10", userId = 2))))
    // memory sink in update mode appends every update; latest per user wins
    val latest = out.groupBy("user_id").agg(max("n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(latest == Map(1L -> 3L, 2L -> 2L))
  }

  test("S2 streaming sliding matches the batch equivalent on a slice") {
    val in = MemoryStream[EventRow]
    val rows = Seq(ev("2024-01-01 10:20:00"), ev("2024-01-01 10:50:00"))
    val out = runToMemory("s2t", StreamingOps.sliding(in.toDF()), "append",
      stream = Some(in), data = Seq(rows, Seq(ev("2024-01-01 13:00:00"))))
    val got = out.select("w_start", "c").as[(Timestamp, Long)].collect()
      .groupMapReduce(_._1)(_._2)(_ + _)
    // 10:20 lands in slide starts 09:30..10:15; 10:50 in 10:00..10:45 →
    // 10:00 and 10:15 windows contain both
    assert(got(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L)
    assert(got(Timestamp.valueOf("2024-01-01 09:30:00")) == 1L)
  }

  test("streaming CDC: dropped binlog file renders like the batch path") {
    val dir = java.nio.file.Files.createTempDirectory("cdcstream")
    val checkpoint = java.nio.file.Files.createTempDirectory("cdccp")
    val results = scala.collection.mutable.ListBuffer.empty[String]
    val q = CdcStream.start(spark, dir.toString,
      graft.cdc.Catalog.fixture(spark), graft.cdc.CdcConfig(),
      checkpoint.toString) { (batch, _) =>
      results ++= batch.select("sql").collect().map(_.getString(0))
    }
    java.nio.file.Files.writeString(dir.resolve("b1.txt"),
      graft.cdc.BinlogFixture.representative)
    q.processAllAvailable()
    q.stop()
    assert(results.size == 3)
    assert(results.head.endsWith(
      "INSERT INTO `testdb`.`t_pk`(`id`, `name`, `score`) VALUES (7, 'name_7', NULL);"))
  }
}
