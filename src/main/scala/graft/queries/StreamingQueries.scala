package graft.queries

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import graft.QueryDef
import graft.QueryDef.SmallOrdered
import graft.streaming.{DocRow, EventRow, KeyedRow, StreamingOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{broadcast, col, count, lit, round, sum, when, window}

/** Driver-visible entries for the streaming surface.
  *
  * s4/s6 — the two capabilities with no batch twin at all (watermark
  * late-row dropping, arbitrary keyed state): fixed MemoryStream
  * scenarios, golden-hash pinned in [[graft.GoldenHashes]]
  * (`addData` + `processAllAvailable` per batch advances the
  * watermark at exact batch boundaries, so the output is a pure
  * function of the scenario at every SF).
  *
  * s7/s10/s12/s13 — ORACLE-BACKED (the c9→c10 pattern): the same
  * streaming operators run over the REAL parquet tables, fed through
  * a MemoryStream in a deterministic order, and the streamed answer
  * must hash-match a DuckDB batch SQL over the same tables. The
  * driver-side collect in each feed is the test harness's SOURCE
  * stand-in (production reads Kafka/files; the operator under test is
  * unchanged and fully distributed) — what the feed buys is
  * determinism: arrival order becomes a pure function of the data, so
  * "first" in keep-first state has a batch-SQL expression. The
  * scenario-level semantics (state across batches, watermark flushes,
  * within-bound matching) stay spec'd in StreamingOpsSpec.
  */
object StreamingQueries {

  /** Memory-sink names must be unique per start() within a session;
    * a counter keeps repeated invocations (bench passes, Verify after
    * tests) from colliding. */
  private val sinkId = new AtomicInteger(0)

  /** Scenario-local event factory. Timestamps are UTC-EXPLICIT
    * (Timestamp.valueOf would parse in the JVM default zone: on a
    * host whose offset is not a multiple of 10 minutes the epoch-
    * aligned windows would shift and the pinned hashes break); ids
    * are a local counter, so concurrent invocations of the two
    * entries cannot interleave id assignment. */
  private final class Events {
    private var eid = 0
    def ev(t: String, userId: Long = 1, eventType: String = "click",
        value: Double = 1.0): EventRow = {
      eid += 1
      val instant = java.time.LocalDateTime
        .parse(t.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
      EventRow(eid.toLong, Timestamp.from(instant), userId, eventType, value, "{}")
    }
  }

  /** Run a streaming frame over scenario batches into a memory sink;
    * returns the sink contents. The query is stopped before returning,
    * so the frame is a plain bounded in-memory table. */
  private def runScenario(spark: SparkSession, mode: String,
      batches: Seq[Seq[EventRow]])(
      op: DataFrame => DataFrame): DataFrame = synchronized {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    val q = op(in.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // Resolve the frame FIRST (its analyzed plan then holds the memory
    // sink's rows directly), then drop the temp view: repeated
    // invocations — bench warm-up + samples, long test sessions —
    // must not accumulate sinks in the catalog for the JVM's lifetime.
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    out
  }

  /** S4 scenario: 3 closed 10-min windows, 2 late rows. Batch 2's
    * 10:30 row advances the watermark to 10:20, closing [10:00,10:10)
    * and [10:10,10:20); batch 3's 10:04/10:15 rows are then below the
    * watermark and MUST be dropped (the closed windows' counts stay 4
    * and 1); batch 4's 11:00 row closes [10:30,10:40). */
  private def s4Batches: Seq[Seq[EventRow]] = {
    val e = new Events
    import e.ev
    Seq(
      Seq(ev("2024-01-01 10:00:00"), ev("2024-01-01 10:02:00"),
        ev("2024-01-01 10:05:30"), ev("2024-01-01 10:08:00"),
        ev("2024-01-01 10:12:00")),
      Seq(ev("2024-01-01 10:30:00")),
      Seq(ev("2024-01-01 10:04:00"), // late: watermark 10:20 → dropped
        ev("2024-01-01 10:15:00"), // late → dropped
        ev("2024-01-01 10:35:00")),
      Seq(ev("2024-01-01 11:00:00")))
  }

  /** S6 scenario: 3 users' counters across 4 batches; the update-mode
    * memory sink keeps EVERY per-batch update, so the output log
    * proves state carried across micro-batches (user 1's counter must
    * appear as 2 then 3 then 5, not reset per batch). */
  private def s6Batches: Seq[Seq[EventRow]] = {
    val e = new Events
    import e.ev
    Seq(
      Seq(ev("2024-01-01 10:00:00", userId = 1), ev("2024-01-01 10:00:05", userId = 1),
        ev("2024-01-01 10:00:10", userId = 2)),
      Seq(ev("2024-01-01 10:01:00", userId = 1), ev("2024-01-01 10:01:10", userId = 3)),
      Seq(ev("2024-01-01 10:02:00", userId = 2), ev("2024-01-01 10:02:10", userId = 2)),
      Seq(ev("2024-01-01 10:03:00", userId = 1), ev("2024-01-01 10:03:10", userId = 1),
        ev("2024-01-01 10:03:20", userId = 3)))
  }

  /** [[runScenario]]'s twin over document batches (the S7 corpus-
    * preprocessing stream). */
  private def runDocScenario(spark: SparkSession, mode: String,
      batches: Seq[Seq[DocRow]])(
      op: DataFrame => DataFrame): DataFrame = synchronized {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DocRow]
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    val q = op(in.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    out
  }

  /** s7 feed: the training slice (source ≠ src1) in doc_id order,
    * chunked into `nBatches` micro-batches — with SAME-TEXT DEFERRAL:
    * a doc whose lowercased text already appeared in some batch is
    * pushed to a LATER batch than that occurrence. Streaming
    * keep-first dedup keeps the first row PROCESSED, and intra-batch
    * processing order after the state-store shuffle is not a contract;
    * deferral makes every duplicate cross a batch boundary, so the
    * winner is always the min doc_id — the order the batch oracle can
    * express — while exercising the dedup state across batches on
    * every real duplicate in the corpus. */
  private def docFeed(spark: SparkSession, dir: String,
      nBatches: Int): Seq[Seq[DocRow]] = {
    val rows = graft.Tables.documents(spark, dir)
      .filter(col("source") =!= "src1")
      .select("doc_id", "source", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => DocRow(r.getLong(0), r.getString(1), r.getString(2)))
    val per = math.max(1, (rows.length + nBatches - 1) / nBatches)
    val lastBatchOfText = scala.collection.mutable.HashMap.empty[String, Int]
    val buckets = scala.collection.mutable.ArrayBuffer
      .fill(nBatches)(scala.collection.mutable.ArrayBuffer.empty[DocRow])
    rows.zipWithIndex.foreach { case (r, i) =>
      val key = r.text.toLowerCase
      val b = math.max(i / per, lastBatchOfText.getOrElse(key, -1) + 1)
      while (buckets.size <= b)
        buckets += scala.collection.mutable.ArrayBuffer.empty[DocRow]
      buckets(b) += r
      lastBatchOfText(key) = b
    }
    buckets.filter(_.nonEmpty).toSeq.map(_.toSeq)
  }

  /** s10 feed: the post-cutoff delta events in event_id order, chunked.
    * No deferral needed — the promoted entry projects the output to the
    * KEY alone, which is winner-invariant (the set of fresh keys does
    * not depend on which delta row won a within-batch race). */
  private def keyedFeed(spark: SparkSession, dir: String,
      nBatches: Int): Seq[Seq[KeyedRow]] = {
    val rows = graft.Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-01 06:00:00").cast("timestamp"))
      .select("event_id", "props")
      .orderBy("event_id")
      .collect()
      .map(r => KeyedRow(r.getLong(0), r.getString(1)))
    rows.grouped(math.max(1, (rows.length + nBatches - 1) / nBatches))
      .map(_.toSeq).toSeq
  }

  /** s12/s13 feed: view+purchase events in GLOBAL ts order, chunked so
    * batch k's min ts ≥ batch k−1's max ts. In-order arrival is what
    * makes the interval join lossless under any watermark: a view is
    * evicted only when vts + bound < watermark ≤ every future row's
    * ts, so no evicted row could still have matched — the streamed
    * inner join emits exactly the batch join's pairs. */
  private def eventFeed(spark: SparkSession, dir: String,
      nBatches: Int): Seq[Seq[EventRow]] = {
    val rows = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => EventRow(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))
    rows.grouped(math.max(1, (rows.length + nBatches - 1) / nBatches))
      .map(_.toSeq).toSeq
  }

  /** s6b feed: the WHOLE event table in (ts, event_id, user_id) order,
    * chunked into fixed-size batches. Ties on the full sort key can
    * only be full-row duplicates, which are interchangeable for
    * counting — the per-(user, batch) event counts, and therefore the
    * counter updates, are a pure function of the data no matter which
    * duplicate lands on which side of a batch boundary. */
  private def eventFeedAll(spark: SparkSession, dir: String,
      nBatches: Int): Seq[Seq[EventRow]] = {
    val rows = graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("ts", "event_id", "user_id")
      .collect()
      .map(r => EventRow(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))
    rows.grouped(math.max(1, (rows.length + nBatches - 1) / nBatches))
      .map(_.toSeq).toSeq
  }

  /** [[runScenario]]'s twin over keyed delta rows (the s10 ingest
    * stream). */
  private def runKeyedScenario(spark: SparkSession, mode: String,
      batches: Seq[Seq[KeyedRow]])(
      op: DataFrame => DataFrame): DataFrame = synchronized {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[KeyedRow]
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    val q = op(in.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    out
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef.noOracle("s4_late_drop") { (s, _) =>
      runScenario(s, "append", s4Batches)(StreamingOps.tumblingLateDrop)
    },

    QueryDef.noOracle("s6_running_counter") { (s, _) =>
      import s.implicits._
      runScenario(s, "update", s6Batches)(df =>
        StreamingOps.runningCounter(df.as[EventRow]).toDF())
    },

    // s6b over the REAL event stream (the c9→c10 pattern applied to
    // arbitrary keyed state): mapGroupsWithState running counters fed
    // the whole events table in (ts, event_id, user_id) order across
    // 6 fixed-size batches. The update-mode sink keeps one row per
    // key per batch TOUCHED — the counter's per-batch snapshots —
    // which batch SQL expresses exactly: assign each row its batch by
    // global row number over the same total order, then the cumulative
    // per-user count at the end of each touched batch. State-across-
    // batch semantics at exact boundaries stay golden-pinned in s6.
    QueryDef("s6b_counter_stream",
      """WITH e AS (SELECT user_id,
        |             ROW_NUMBER() OVER (ORDER BY CAST(ts AS TIMESTAMP), event_id, user_id) - 1 AS rn,
        |             COUNT(*) OVER () AS nt
        |           FROM events),
        |eb AS (SELECT user_id, rn // ((nt + 5) // 6) AS b FROM e),
        |pb AS (SELECT user_id, b, COUNT(*) AS c FROM eb GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY b) AS BIGINT) AS n
        |FROM pb ORDER BY user_id, n""".stripMargin) { (s, d) =>
      import s.implicits._
      runScenario(s, "update", eventFeedAll(s, d, 6))(df =>
        StreamingOps.runningCounter(df.as[EventRow]).toDF())
        .orderedRows(col("user_id"), col("n"))
    },

    // s23: the transformWithState API (r12) — Spark 4's arbitrary-state
    // v2: named typed state handles (per-state TTL, timers, state
    // schema evolution) replacing mapGroupsWithState's single opaque
    // state object, backed by RocksDB. Same certification shape as
    // s6b: the whole events table replays in 6 batches, the update-
    // mode sink logs every per-batch running (n, cents) per user, and
    // the oracle re-derives the identical emission log from the batch
    // table (row-number bucketing = the feed's batch boundaries). The
    // provider conf is set for this query and restored after.
    QueryDef("s23_tws_running_stats",
      """WITH e AS (SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
        |             ROW_NUMBER() OVER (ORDER BY CAST(ts AS TIMESTAMP), event_id, user_id) - 1 AS rn,
        |             COUNT(*) OVER () AS nt
        |           FROM events),
        |eb AS (SELECT user_id, cents, rn // ((nt + 5) // 6) AS b FROM e),
        |pb AS (SELECT user_id, b, COUNT(*) AS c, SUM(cents) AS sc FROM eb GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(c) OVER w AS BIGINT) AS n,
        |       CAST(SUM(sc) OVER w AS BIGINT) AS cents
        |FROM pb WINDOW w AS (PARTITION BY user_id ORDER BY b)
        |ORDER BY user_id, n""".stripMargin) { (s, d) =>
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.get(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        runScenario(s, "update", eventFeedAll(s, d, 6))(df =>
          StreamingOps.runningStatsTws(df.as[EventRow]).toDF())
          .orderedRows(col("user_id"), col("n"))
      } finally s.conf.set(key, prev)
    },

    // s24: dropDuplicatesWithinWatermark (r13) — Spark 3.5+'s
    // state-BOUNDED streaming dedup: exact dedup is guaranteed only
    // for duplicates arriving within the watermark delay, which is
    // what lets the state store EXPIRE keys instead of growing with
    // every key ever seen (plain dropDuplicates' unbounded-state trap
    // on a 100 TB stream). Certified in two halves: this entry pins
    // the within-delay behavior as a full DuckDB oracle — the delay
    // exceeds the corpus's time span, so no key expires and the
    // streamed output is exactly one row per distinct (user_id,
    // event_type); projecting to the KEY alone is winner-invariant
    // (which duplicate wins a within-batch race cannot change the key
    // set — the s10 trick). The distinguishing expire-then-re-emit
    // semantics is golden-pinned in StreamingOpsSpec, where batch
    // boundaries are exact.
    QueryDef("s24_dedup_within_watermark",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      runScenario(s, "append", eventFeedAll(s, d, 6))(df =>
        df.withWatermark("ts", "365 days")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select(col("user_id"), col("event_type")))
        .orderedRows(col("user_id"), col("event_type"))
    },

    // s17: DYNAMIC-GAP sessionization — flatMapGroupsWithState logic
    // session_window can't express (the idle gap after each event
    // depends on that event's type: purchase 60 min, else 30), run
    // over the REAL events table in global ts order with a sentinel
    // final batch closing tail sessions (the finite-replay stand-in
    // for watermark advance). Sessions emit exactly once, on close.
    // The oracle is the dynamic-gap gaps-and-islands rewrite: a new
    // session starts where the wait since the PREVIOUS event exceeds
    // that previous event's allowance; identical ms arithmetic on
    // both engines.
    QueryDef("s17_dynamic_sessions",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |             event_type FROM events),
        |l AS (SELECT *, LAG(t) OVER w AS pt, LAG(event_type) OVER w AS ptype
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |brk AS (SELECT *, CASE WHEN pt IS NULL OR
        |          epoch_ms(t) - epoch_ms(pt) >
        |            CASE WHEN ptype = 'purchase' THEN 3600000 ELSE 1800000 END
        |          THEN 1 ELSE 0 END AS is_new FROM l),
        |sess AS (SELECT *, SUM(is_new) OVER (
        |           PARTITION BY user_id ORDER BY t, event_id) AS sid FROM brk)
        |SELECT user_id,
        |  CAST(epoch_ms(MIN(t)) AS BIGINT) AS start_ms,
        |  CAST(epoch_ms(MAX(t)) AS BIGINT) AS end_ms,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purchases
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin) { (s, d) =>
      import s.implicits._
      val batches = eventFeedAll(s, d, 6)
      val sentinel = batches.flatten.map(_.user_id).distinct.sorted
        .map(u => EventRow(-1L, new java.sql.Timestamp(0L), u, "__end__", 0.0, ""))
      runScenario(s, "append", batches :+ sentinel)(df =>
        StreamingOps.dynamicSessions(df.as[EventRow]).toDF())
        .orderedRows(col("user_id"), col("start_ms")) // sessions scale
    },

    // s19: COMPLETE-mode streaming top-k — the live-dashboard shape
    // (leaderboard over an unbounded stream) and the one OutputMode
    // the surface didn't yet exercise: the sink holds the FULL
    // re-ranked answer after every trigger, not a delta — which is
    // exactly why it composes with streaming sort+limit (forbidden in
    // append, where a global order can never close). State = the
    // per-user aggregate, NOT the stream; the final snapshot after
    // the last batch must equal the batch SQL over everything.
    QueryDef("s19_complete_topk",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events
        |GROUP BY 1 ORDER BY c DESC, user_id LIMIT 10""".stripMargin) { (s, d) =>
      runScenario(s, "complete", eventFeedAll(s, d, 6))(df =>
        df.groupBy("user_id").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("user_id")).limit(10))
        .orderedSmall(col("c").desc, col("user_id")) // k rows: bounded
    },

    // s7 over the REAL corpus: the streaming preprocessing pipeline
    // (p1's stages in the operator's order — gates → mix-sample →
    // keep-first dedup state → broadcast decontamination vs the src1
    // eval slice), fed in doc_id order with same-text deferral so the
    // keep-first winner is the min doc_id. The oracle mirrors the
    // OPERATOR's stage order (sample before dedup — p1's batch oracle
    // dedups first, a deliberate difference: in a stream, sampling is
    // a row-wise gate and dedup state only ever sees sampled rows).
    QueryDef("s7_preprocess_stream",
      """WITH gated AS (
        |  SELECT doc_id, source, lower(text) AS ltext,
        |         CAST(LEN(STRING_SPLIT(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |  WHERE source <> 'src1'
        |    AND LEN(STRING_SPLIT(text,' ')) >= 24
        |    AND LEN(LIST_DISTINCT(STRING_SPLIT(text,' ')))*1.0/LEN(STRING_SPLIT(text,' ')) >= 0.30),
        |sampled AS (
        |  SELECT * FROM gated
        |  WHERE doc_id % 100 <
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4','src5') THEN 25
        |         WHEN source IN ('src6','src7','src8','src9','src10','src11') THEN 50
        |         ELSE 100 END),
        |dd AS (SELECT * FROM sampled
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY ltext ORDER BY doc_id) = 1),
        |esh AS (
        |  SELECT DISTINCT array_to_string(ts[i+1:i+8], ' ') AS shingle
        |  FROM (SELECT STRING_SPLIT(lower(text),' ') AS ts FROM documents WHERE source = 'src1'),
        |       UNNEST(range(0, GREATEST(LEN(ts)-7,0))) AS u(i)),
        |cont AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, array_to_string(ts[i+1:i+8],' ') AS shingle
        |        FROM (SELECT doc_id, STRING_SPLIT(ltext,' ') AS ts FROM dd),
        |             UNNEST(range(0, GREATEST(LEN(ts)-7,0))) AS u(i)) s
        |  JOIN esh USING (shingle))
        |SELECT doc_id, source, n_tok FROM dd ANTI JOIN cont USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val evalTexts = graft.Tables.documents(s, d)
        .filter(col("source") === lit("src1"))
        .select("text").collect().map(_.getString(0)).toSeq
      runDocScenario(s, "append", docFeed(s, d, 6))(docs =>
        StreamingOps.preprocessStream(docs,
          StreamingOps.shingleSetOf(evalTexts),
          mixRate = when(col("source")
            .isin("src0", "src1", "src2", "src3", "src4", "src5"), lit(25))
            .when(col("source")
              .isin("src6", "src7", "src8", "src9", "src10", "src11"), lit(50))
            .otherwise(lit(100))))
        .orderedRows(col("doc_id"))
    },

    // s10 over the REAL event stream: d6's incremental-ingest shape —
    // base = the first six hours' payloads (a static frame the stream
    // anti-joins against), delta = everything after, streamed in
    // event_id order. The entry projects to the KEY alone, which is
    // winner-invariant (the set of fresh keys does not depend on
    // which delta row won a within-batch race), so the streamed
    // answer equals the batch NOT-EXISTS + DISTINCT under any
    // processing order; the keep-first WINNER semantics stay spec'd
    // in StreamingOpsSpec.
    QueryDef("s10_delta_dedup_stream",
      """WITH base AS (SELECT props FROM events
        |              WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-01 06:00:00'),
        |delta AS (SELECT props FROM events
        |          WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 06:00:00')
        |SELECT DISTINCT props AS key FROM delta d
        |WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.props = d.props)
        |ORDER BY key""".stripMargin) { (s, d) =>
      val cut = lit("2024-01-01 06:00:00").cast("timestamp")
      val base = graft.Tables.events(s, d)
        .filter(col("ts") < cut).select(col("props").as("key"))
      runKeyedScenario(s, "append", keyedFeed(s, d, 6))(delta =>
        StreamingOps.deltaDedupStream(delta, base).select("key"))
        .orderedRows(col("key"))
    },

    // s12 over the REAL event stream: view→purchase interval
    // attribution as a streaming self-join. The ts-ordered feed makes
    // the inner join LOSSLESS (see eventFeed), so the streamed pairs
    // are exactly the batch interval join's — each emitted once, in
    // append mode, with both sides' state bounded by the watermark.
    QueryDef("s12_stream_join",
      """WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id AS p_user, CAST(ts AS TIMESTAMP) AS pts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT user_id, view_id, purchase_id, vts, pts
        |FROM v JOIN p ON user_id = p_user
        |  AND pts > vts AND pts <= vts + INTERVAL 30 MINUTE
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, d) =>
      runScenario(s, "append", eventFeed(s, d, 6))(StreamingOps.viewPurchaseJoin(_))
        .orderedRows(col("view_id"), col("purchase_id"))
    },

    // s13: the LEFT OUTER form. Matched pairs equal the batch join
    // (same losslessness argument); an UNMATCHED view emits (view,
    // null) exactly when the final join watermark — min over both
    // sides of (max event time − 10-min delay), reached via the
    // no-data micro-batch after the last feed batch — closes its
    // 30-minute window. The oracle reproduces that eviction predicate
    // in SQL; views still open at end-of-stream are withheld on both
    // sides. (Event times carry random microseconds, so the strict/
    // non-strict boundary and Spark's ms-floored watermark cannot
    // land on a row.)
    QueryDef("s13_stream_outer_join",
      """WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id AS p_user, CAST(ts AS TIMESTAMP) AS pts
        |      FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT LEAST((SELECT MAX(vts) FROM v), (SELECT MAX(pts) FROM p))
        |              - INTERVAL 10 MINUTE AS w),
        |j AS (SELECT user_id, view_id, purchase_id, vts, pts
        |      FROM v LEFT JOIN p ON user_id = p_user
        |        AND pts > vts AND pts <= vts + INTERVAL 30 MINUTE)
        |SELECT user_id, view_id, purchase_id, vts, pts FROM j
        |WHERE purchase_id IS NOT NULL
        |   OR vts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, d) =>
      runScenario(s, "append", eventFeed(s, d, 6))(
        StreamingOps.viewPurchaseJoin(_, joinType = "left_outer"))
        .orderedRows(col("view_id"), col("purchase_id"))
    },

    // s20: stream-stream FULL OUTER join — the remaining join mode:
    // BOTH sides' unmatched rows emit exactly once, each when the
    // join watermark proves its own match window closed. A view's
    // null-row emits once no purchase can follow (s13's predicate:
    // vts + 30 min below the watermark); a purchase's null-row emits
    // once no view can still precede it (every matching view has
    // vts < pts, and new arrivals sit above the watermark — so pts
    // below the watermark closes it). Open rows on either side stay
    // withheld at end-of-stream; random microseconds keep the
    // boundary off every row, as in s13.
    QueryDef("s20_stream_full_outer",
      """WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id AS p_user, CAST(ts AS TIMESTAMP) AS pts
        |      FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT LEAST((SELECT MAX(vts) FROM v), (SELECT MAX(pts) FROM p))
        |              - INTERVAL 10 MINUTE AS w),
        |j AS (SELECT COALESCE(user_id, p_user) AS user_id, view_id,
        |             purchase_id, vts, pts
        |      FROM v FULL JOIN p ON user_id = p_user
        |        AND pts > vts AND pts <= vts + INTERVAL 30 MINUTE)
        |SELECT user_id, view_id, purchase_id, vts, pts FROM j
        |WHERE (view_id IS NOT NULL AND purchase_id IS NOT NULL)
        |   OR (purchase_id IS NULL AND vts + INTERVAL 30 MINUTE < (SELECT w FROM wm))
        |   OR (view_id IS NULL AND pts < (SELECT w FROM wm))
        |ORDER BY view_id NULLS FIRST, purchase_id NULLS FIRST""".stripMargin) { (s, d) =>
      runScenario(s, "append", eventFeed(s, d, 6))(
        StreamingOps.viewPurchaseJoin(_, joinType = "full_outer"))
        .orderedRows(col("view_id"), col("purchase_id")) // Spark asc = NULLS FIRST
    },

    // s21 (r11): STREAM-STATIC dimension enrichment — the most common
    // production streaming join: an unbounded event stream broadcast-
    // joined to a bounded dimension table (user → customer → nation),
    // stateless append (no watermark, no state store — the static
    // side is a broadcast build per micro-batch). The whole events
    // table streams through in 6 batches; the entry aggregates the
    // enriched sink so the output is bounded, and the oracle is the
    // plain batch join+aggregate over the same two tables — streamed
    // enrichment must be row-for-row the batch join. `value` sums as
    // exact integer cents so the aggregate is order-free. Scale
    // shape: dims broadcast (the CDC catalog pattern); the stream
    // never shuffles before the bounded final aggregate.
    QueryDef("s21_stream_static_join",
      """SELECT c.c_nationkey AS nation, e.event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY nation, event_type""".stripMargin) { (s, d) =>
      val dim = graft.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      runScenario(s, "append", eventFeedAll(s, d, 6))(df =>
        df.join(broadcast(dim), col("user_id") === col("c_custkey"))
          .select(col("c_nationkey").as("nation"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents")))
        .groupBy("nation", "event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
        .orderedSmall(col("nation"), col("event_type")) // nations×types: bounded
    },

    // s22: CHAINED STATEFUL OPERATORS — two time-window aggregations
    // in ONE streaming query (the rollup-of-a-rollup every metrics
    // pipeline wants): per-user 10-minute counts feed a 30-minute
    // rollup of active user-buckets and event totals, both stateful,
    // both bounded by the same watermark, state handed window-to-
    // window WITHOUT materializing the intermediate to a sink and
    // re-reading it (one query, one checkpoint, exactly-once across
    // BOTH operators — the property the two-query workaround loses).
    // The first agg's window column IS the event time of the second
    // (Spark's chained-window support); a far-future sentinel advances
    // the watermark to close tail windows at end of replay, then is
    // dropped post-sink. Oracle: the identical two-level rollup in
    // batch SQL.
    QueryDef("s22_chained_windows",
      """WITH b AS (SELECT TIME_BUCKET(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP)) AS w10,
        |                  user_id, CAST(COUNT(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2)
        |SELECT TIME_BUCKET(INTERVAL 30 MINUTE, w10) AS w30_start,
        |       CAST(COUNT(*) AS BIGINT) AS active_buckets,
        |       CAST(SUM(c) AS BIGINT) AS n
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sentinel = Seq(EventRow(-1L,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L,
        "__end__", 0.0, ""))
      runScenario(s, "append", eventFeedAll(s, d, 6) :+ sentinel)(df =>
        df.withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
          .agg(count(lit(1)).as("c"))
          .groupBy(window(col("window"), "30 minutes").as("w30"))
          .agg(count(lit(1)).as("active_buckets"), sum("c").as("n"))
          .select(col("w30.start").as("w30_start"),
            col("active_buckets"), col("n")))
        .filter(col("w30_start") < lit("2029-01-01").cast("timestamp"))
        .orderedRows(col("w30_start")) // rows scale with the time range
    },

    // s29: STREAMING UNIFORM SAMPLE with k-bounded state (late r15) —
    // the sampling family's streaming twin (t5 rate, t17 quota, t23
    // weighted are batch one-shots; a long-running ingest needs a
    // standing representative sample for monitoring/eval draws).
    // Deterministic hash-priority reservoir: keep the k smallest
    // (xxhash64(event_id), id); bottom-k by a pure row function is
    // merge-commutative, so the streamed fold equals the batch
    // bottom-k whatever the feed chunking (split-invariance spec'd in
    // StreamingOpsSpec) and the entry carries a FULL batch oracle —
    // DuckDB re-derives xxhash64 of the BIGINT id itself (t23's
    // hashLong HUGEINT machinery, seed 42) and takes the same
    // bottom-k. State = the ≤k winners, never the stream.
    QueryDef("s29_sample_stream", SampleStreamSql(500)) { (s, d) =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val in = MemoryStream[EventRow]
      var state: Option[DataFrame] = None
      val ckpt = graft.TmpDirs.scratch("graft_s29_cp")
      val q = in.toDF()
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          state = Some(graft.streaming.StreamingOps
            .sampleFold(state, batch, 500).localCheckpoint())
        }
        .start()
      try {
        eventFeedAll(s, d, 6).foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()
      state.get.select("event_id", "user_id", "event_type")
        .orderedSmall(col("event_id")) // k rows: bounded
    }
  )

  /** s29's oracle: bottom-`k` events by (xxhash64(event_id), id) —
    * the hashLong single-long path in HUGEINT SQL (t23's derivation,
    * seed 42, matching Spark's builtin xxhash64 over a BIGINT). */
  private def SampleStreamSql(k: Int): String = {
    import SqlHash._
    val h0 = (BigInt(42) + BigInt(P5) + 8) % BigInt(Mod)
    s"""WITH d AS (SELECT event_id, user_id, event_type FROM events),
       |h0 AS (SELECT *,
       |       ((CAST(event_id AS HUGEINT) % $Mod + $Mod) % $Mod) AS u FROM d),
       |k1 AS (SELECT event_id, user_id, event_type,
       |       ${mul64(rotl(mul64("u", P2), 31), P1)} AS k FROM h0),
       |s1 AS (SELECT event_id, user_id, event_type,
       |       ${xor64(h0.toString, "k")} AS h FROM k1),
       |s2 AS (SELECT event_id, user_id, event_type,
       |       (${mul64(rotl("h", 27), P1)} + $P4) % $Mod AS h FROM s1),
       |a1 AS (SELECT event_id, user_id, event_type,
       |       ${mul64(xor64("h", shr("h", 33)), P2)} AS h FROM s2),
       |a2 AS (SELECT event_id, user_id, event_type,
       |       ${mul64(xor64("h", shr("h", 29)), P3)} AS h FROM a1),
       |hh AS (SELECT event_id, user_id, event_type,
       |       ${xor64("h", shr("h", 32))} AS h FROM a2),
       |hs AS (SELECT event_id, user_id, event_type,
       |        CASE WHEN h >= 9223372036854775808 THEN h - $Mod
       |             ELSE h END AS h FROM hh),
       |r AS (SELECT event_id, user_id, event_type,
       |        ROW_NUMBER() OVER (ORDER BY h, event_id) AS rn FROM hs)
       |SELECT event_id, user_id, event_type FROM r
       |WHERE rn <= $k ORDER BY event_id""".stripMargin
  }
}
