package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star-schema parquet corpus
  * (TESTDATA.md / FIXTURES.md §1).
  *
  * `events.ts` has been written two ways by the corpus generator:
  * parquet TIMESTAMP(NANOS) (readable only via
  * `spark.sql.legacy.parquet.nanosAsLong=true`, giving a nanos
  * BIGINT we floor-divide to microseconds) or TIMESTAMP(MICROS)
  * (read natively as TIMESTAMP_NTZ). `load` normalizes either to a
  * session-TZ TIMESTAMP; the oracle SQL's `CAST(ts AS TIMESTAMP)`
  * truncates the same way, so both engines agree at microsecond
  * precision regardless of the writer's physical type.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // One DataFrame per (session, dir, table): spark.read.parquet reads
  // footers for schema on every call, a measurable per-query tax when
  // the suite loads the same ten tables repeatedly. The logical plan
  // is immutable and safely shared; file listing stays fresh via
  // Spark's own FileStatusCache. Keyed on the session REFERENCE
  // (identity equality — unlike identityHashCode strings, references
  // cannot collide between live sessions or be confused with a GC'd
  // one); entries whose session's CONTEXT is stopped are purged on the
  // next load. Known limitation: sessions created via newSession()/
  // cloneSession() share a live context, so many short-lived child
  // sessions on one context are never purged (and are strongly held)
  // until the context stops — fine for the one-session-per-JVM usage
  // here; a long-lived multi-tenant driver should key a WeakHashMap
  // per session instead.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // purge entries bound to stopped sessions (cheap: map stays small)
    loaded.values.removeIf(df => df.sparkSession.sparkContext.isStopped)
    loaded.computeIfAbsent(
      (spark, dir, name), _ => {
      // Legacy conf is runtime-settable; Verify/Bench also set it at
      // session build time, this covers ad-hoc sessions (tests, shells).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") {
        // `ts` physical type has varied across corpus generations:
        // TIMESTAMP(NANOS) (read as nanos BIGINT via the legacy conf)
        // vs TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ).
        // Normalize both to a session-TZ TIMESTAMP; under the UTC
        // session both paths yield the identical instant, so downstream
        // plans and golden hashes are unchanged by the writer's choice.
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _: org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts", col("ts").cast("timestamp"))
          case _ => df
        }
      } else df
    })
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
