package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tables.load's events-ts normalization: the corpus generator has
  * shipped `ts` as parquet TIMESTAMP(NANOS) (read as a nanos BIGINT
  * under the legacy conf) and as TIMESTAMP(MICROS) (read natively as
  * TIMESTAMP_NTZ). Both layouts must load to the SAME session-TZ
  * TIMESTAMP instants — the round-8 schema change broke 13 entries
  * through this seam, so the equivalence is pinned here.
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("nanos-as-long and micros-NTZ ts layouts load identically") {
    import spark.implicits._
    val micros = Seq(
      (1L, 1704067200000000L), // 2024-01-01 00:00:00 UTC
      (2L, 1704067201500000L), // +1.5 s
      (3L, 1706745599999999L)) // end-of-month boundary, µs precision
    val base = java.nio.file.Files.createTempDirectory("graft_tablespec")
    // layout A: micros TIMESTAMP_NTZ (the current generator)
    val dirA = s"$base/a"
    micros.toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.parquet(s"$dirA/events.parquet")
    // layout B: nanos BIGINT (the legacy generator under nanosAsLong;
    // physical type is irrelevant to the loader — it dispatches on
    // the READ schema, which for TIMESTAMP(NANOS) is LongType)
    val dirB = s"$base/b"
    micros.toDF("event_id", "us")
      .select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.parquet(s"$dirB/events.parquet")
    def loaded(dir: String) = Tables.events(spark, dir)
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant)).toSet
    val (a, b) = (loaded(dirA), loaded(dirB))
    assert(a == b, s"a=$a b=$b")
    assert(a.map(_._2.toString) == Set(
      "2024-01-01T00:00:00Z", "2024-01-01T00:00:01.500Z",
      "2024-01-31T23:59:59.999999Z"))
    // both load as session-TZ TIMESTAMP (not NTZ): downstream
    // comparisons against to_timestamp literals must keep resolving
    assert(Tables.events(spark, dirA).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
