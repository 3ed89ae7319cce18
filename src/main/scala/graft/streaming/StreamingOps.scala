package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Typed event row (events table schema, FIXTURES.md §1). */
final case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

final case class UserCount(user_id: Long, n: Long)

/** Streaming surface S1–S6 (SURVEY.md §2.3): the same logical ops as
  * the EventOps batch equivalents, expressed over an unbounded source.
  * Each takes a *streaming* DataFrame with the events schema (from
  * `readStream` or a MemoryStream) and returns a streaming result;
  * batch-equivalence and late-data semantics are asserted in
  * StreamingOpsSpec.
  *
  * Watermarks bound state: at 100 TB/day the per-window/per-session
  * state would otherwise grow without bound — every stateful op here
  * declares one.
  */
object StreamingOps {

  /** S1: 1 h tumbling windows per event_type. */
  def tumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("w"), col("event_type"), col("c"), col("sv"))

  /** S2: 1 h windows sliding every 15 min. */
  def sliding(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("w_start"), col("event_type"), col("c"))

  /** S3: session windows with a 30 min gap, per user. */
  def sessions(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** S4: tumbling agg whose late rows (older than the watermark) are
    * dropped — the scenario fixture uses 10 min windows so a 10 min
    * watermark can actually expire them (FIXTURES.md §5). */
  def tumblingLateDrop(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("w"), col("c"))

  /** S5: streaming dedup by event_id, state bounded by the watermark. */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** S6: per-user running event counter via mapGroupsWithState — the
    * custom-state escape hatch (reference has nothing comparable; this
    * is the engine's `flatMapGroupsWithState` surface). */
  def runningCounter(events: Dataset[EventRow]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserCount] {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          UserCount(uid, n)
      }
  }
}
