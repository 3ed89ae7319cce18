package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Typed event row (events table schema, FIXTURES.md §1). */
final case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

final case class UserCount(user_id: Long, n: Long)

/** s23 output: running per-user totals from transformWithState. */
final case class UserStats(user_id: Long, n: Long, cents: Long)

/** Typed document row (documents table core columns) for streaming
  * scenarios over the corpus-preprocessing surface. */
final case class DocRow(doc_id: Long, source: String, text: String)

/** Row shape for the s10 delta-ingest stream (id, dedup key). */
final case class KeyedRow(id: Long, key: String)

/** One CLOSED session from [[StreamingOps.dynamicSessions]]. */
final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
    n_events: Long, n_purchases: Long)

/** Open-session state for [[StreamingOps.dynamicSessions]]: O(1) per
  * key — never buffers events. */
final case class SessionAcc(startMs: Long, lastMs: Long, lastType: String,
    n: Long, nPurch: Long)

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

  /** Streaming twin of `DedupOps.bloomDeltaDedup` (s10): an unbounded
    * delta stream deduped against a STATIC ingested base — emit rows
    * whose `key` is absent from base, first arrival per key winning
    * across micro-batches. The stream-static anti probe is STATELESS
    * (each micro-batch probes the static side; Spark broadcasts it
    * when small, and at scale the batch form's Bloom bitmap takes
    * that role); the only state store is dropDuplicates over NOVEL
    * keys — probing base FIRST means already-ingested keys never
    * enter state. Exact keep-first over an unbounded stream
    * genuinely needs unbounded key state; a production pipeline with
    * bounded arrival skew bounds it via dropDuplicatesWithinWatermark
    * (the S5 form). */
  def deltaDedupStream(delta: DataFrame, base: DataFrame): DataFrame =
    delta.join(base, Seq("key"), "left_anti").dropDuplicates("key")

  /** s29: one micro-batch folded into a streaming UNIFORM k-SAMPLE
    * with k-BOUNDED state — the sampling family's missing streaming
    * twin (t5/t17/t23 are batch one-shots). Deterministic reservoir
    * via HASH-PRIORITY: keep the k smallest (xxhash64(event_id), id)
    * keys seen so far. Every id's priority is a pure function of the
    * ROW, so bottom-k is merge-commutative and batch-split-invariant
    * (the k7/d6 fold property): the streamed sample equals the batch
    * bottom-k over the whole corpus, under ANY feed chunking — unlike
    * the classic replace-with-probability reservoir, whose output
    * depends on arrival order and RNG state and could never carry a
    * batch oracle. State = the ≤k current winners (orderBy+limit
    * plans as TakeOrdered over state ∪ batch), never the stream. */
  def sampleFold(state: Option[DataFrame], batch: DataFrame,
      k: Int): DataFrame = {
    val scored = batch.withColumn("h", xxhash64(col("event_id")))
    state.map(_.unionByName(scored)).getOrElse(scored)
      .orderBy(col("h"), col("event_id")).limit(k)
  }

  /** S12: stream-stream interval join — attribute each purchase to
    * every view by the same user in the preceding 30 minutes. Both
    * sides derive from ONE events stream (a streaming self-join):
    * views and purchases are filtered projections, each carrying its
    * own watermark, joined on user with a two-sided time bound. The
    * bounds are what make this run at scale: Spark derives a state
    * watermark from them, so each side buffers only ~30 min + lateness
    * of rows instead of the whole stream — an unbounded-state join
    * needs no such constraint to be *correct*, but would OOM on day
    * two of a real feed. Inner join in append mode: a match emits
    * exactly once, when both rows have arrived. */
  /** `joinType` "inner" (s12) or "left_outer" (s13): the OUTER form
    * adds the semantics only a watermark makes possible on an
    * unbounded stream — a view with no purchase in its 30-minute
    * window emits (view, null) exactly once, when the watermark
    * proves no match can still arrive. Unmatched results are
    * therefore emitted LATE by up to bound+lateness, the price of
    * exactly-once nulls. */
  def viewPurchaseJoin(events: DataFrame,
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("vts"))
      .withWatermark("vts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
      .withWatermark("pts", watermark)
    views.join(purchases,
      expr("""v_user = p_user AND
              pts > vts AND pts <= vts + INTERVAL 30 MINUTES"""), joinType)
      // coalesce: under full_outer an unmatched purchase has no
      // v_user; inner/left_outer rows always carry it (no-op there)
      .select(coalesce(col("v_user"), col("p_user")).as("user_id"),
        col("view_id"), col("purchase_id"), col("vts"), col("pts"))
  }

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

  /** S23: the same running fold through Spark 4's transformWithState —
    * the arbitrary-state v2 API (typed named state handles with
    * per-state TTL, timers, and schema evolution of state — the
    * operational features `mapGroupsWithState`'s single opaque state
    * object lacks). State here is one named ValueState[(n, cents)]
    * per user; each batch folds its rows in and emits the running
    * totals, so the update-mode sink logs state carried across
    * micro-batches. Requires the RocksDB state store provider (the
    * v2 API's backing store) — callers set it for the query. */
  class RunningStatsProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, EventRow, UserStats] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("stats",
        org.apache.spark.sql.Encoders.product[(Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStats] = {
      var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { r => n += 1; cents += math.round(r.value * 100) }
      st.update((n, cents))
      Iterator.single(UserStats(key, n, cents))
    }
  }

  def runningStatsTws(events: Dataset[EventRow]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** S17: DYNAMIC-GAP sessionization via flatMapGroupsWithState — the
    * state logic `session_window` cannot express: the allowed idle gap
    * after each event depends on THAT event's type (a purchase keeps
    * the session alive [[purchaseGapMs]]; anything else
    * [[baseGapMs]]), and a session emits EXACTLY ONCE, when it closes.
    * Per-key state is one open session (O(1) — never the event
    * backlog); a batch's rows for a key are sorted by (ts, event_id)
    * inside the function, so the fold is a pure function of the data
    * whatever order the shuffle delivered them, provided batches
    * arrive in global ts order (the feed's contract — out-of-order
    * ACROSS batches would need an event-time-timeout buffer instead).
    * A row with event_type `__end__` is the end-of-stream sentinel:
    * it closes the key's open session without opening a new one —
    * the finite-replay stand-in for the watermark-advance that closes
    * tail sessions on a live stream. */
  def dynamicSessions(events: Dataset[EventRow],
      baseGapMs: Long = 1800000L,
      purchaseGapMs: Long = 3600000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[SessionAcc]) =>
          val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          def close(): Unit = if (st != null) {
            out += SessionOut(uid, st.startMs, st.lastMs, st.n, st.nPurch)
            st = null
          }
          for (r <- sorted) {
            if (r.event_type == "__end__") close()
            else {
              val t = r.ts.getTime
              if (st != null) {
                val gap = if (st.lastType == "purchase") purchaseGapMs else baseGapMs
                if (t - st.lastMs > gap) close()
              }
              val p = if (r.event_type == "purchase") 1L else 0L
              st =
                if (st == null) SessionAcc(t, t, r.event_type, 1L, p)
                else SessionAcc(st.startMs, t, r.event_type, st.n + 1, st.nPurch + p)
            }
          }
          if (st == null) state.remove() else state.update(st)
          out.iterator
      }
  }

  /** S7: the corpus-preprocessing pipeline (p1's semantics) over an
    * unbounded document stream — quality gates, keep-FIRST exact dedup
    * (arrival order is the streaming notion of "first"; the batch twin
    * keys on min doc_id), deterministic mix-sampling, and exact
    * n-gram decontamination against a BROADCAST eval shingle set.
    * Emits the survivor stream in append mode: one stateful operator
    * (the dedup state), everything else row-wise — the shape that
    * survives at ingest scale, where the cleaned stream is what gets
    * materialized and any totals are a downstream aggregation.
    *
    * The gates run BEFORE the dedup so state only ever holds hashes of
    * docs that could survive (same rewrite as p1's: the gate is a pure
    * function of text, so it commutes with content-hash dedup). State
    * here is unbounded by design — exact corpus dedup means remembering
    * every content hash; a deployment that can tolerate a horizon uses
    * `dropDuplicatesWithinWatermark` (the s5 form) instead.
    *
    * `mixRate` is the per-row sampling percentage as a Column over the
    * input schema (e.g. a `when` ladder on source); a doc survives iff
    * doc_id % 100 < rate, the same splittable-hash contract as t5.
    */
  def preprocessStream(docs: DataFrame, evalShingles: Set[String],
      mixRate: org.apache.spark.sql.Column, nGram: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(evalShingles)
    val toks = split(col("text"), " ")
    docs
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("ttr",
        size(array_distinct(toks)) * lit(1.0) / size(toks))
      .filter(col("n_tok") >= 24 && col("ttr") >= 0.30)
      .filter(pmod(col("doc_id"), lit(100)) < mixRate)
      .withColumn("content_hash", md5(lower(col("text"))))
      .dropDuplicates("content_hash")
      .select(col("doc_id"), col("source"),
        lower(col("text")).as("text"), col("n_tok"))
      .as[(Long, String, String, Long)](graft.Enc.longStrStrLong)
      .filter { t: (Long, String, String, Long) =>
        !anyShingleIn(t._3, bc.value, nGram)
      }
      .toDF("doc_id", "source", "text", "n_tok")
      .select("doc_id", "source", "n_tok")
  }

  /** Does any `n`-token shingle of `text` appear in `set`? Same
    * tokenization and delimiter contract as TextAnalysis.decontaminate
    * (single-space split; shingles joined with ' '). */
  private def anyShingleIn(text: String, set: Set[String], n: Int): Boolean = {
    val ts = text.split(" ", -1)
    var i = 0
    while (i <= ts.length - n) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(ts(j))
        j += 1
      }
      if (set.contains(sb.toString)) return true
      i += 1
    }
    false
  }

  /** The eval-side shingle set for [[preprocessStream]] — built once
    * from the (small, by the decontamination contract) eval corpus. */
  def shingleSetOf(texts: Seq[String], n: Int = 8): Set[String] = {
    val out = Set.newBuilder[String]
    texts.foreach { t =>
      val ts = t.toLowerCase.split(" ", -1)
      var i = 0
      while (i <= ts.length - n) {
        out += ts.slice(i, i + n).mkString(" ")
        i += 1
      }
    }
    out.result()
  }
}
