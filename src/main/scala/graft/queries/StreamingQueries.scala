package graft.queries

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import graft.QueryDef
import graft.streaming.{DocRow, EventRow, KeyedRow, StreamingOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, when}

/** Driver-visible entries for the STREAMING-ONLY surface (SURVEY.md
  * §2.3 S4/S6) — the two capabilities with no batch twin: watermark
  * late-row dropping and arbitrary keyed state. Each runs a fixed
  * MemoryStream scenario through the real `graft.streaming` operator
  * (micro-batch engine, memory sink) and returns the sink table as a
  * batch frame.
  *
  * Determinism: `addData` + `processAllAvailable` per batch advances
  * the watermark at exact batch boundaries, so which rows are late and
  * which windows close is a pure function of the scenario — the output
  * is golden-hash pinned in [[graft.GoldenHashes]] (scenario data is
  * SF-independent by design: these entries certify streaming
  * SEMANTICS, not data scale, and the pinned hash must hold at every
  * SF the driver runs). No SQL oracle exists — DuckDB has no
  * watermark/state semantics to re-express.
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

  /** A 26-token all-distinct text (passes both gates: n_tok ≥ 24,
    * ttr = 1.0), parameterized so each doc is distinct content. */
  private def cleanText(tag: String): String =
    (1 to 26).map(i => s"$tag$i").mkString(" ")

  /** S7 eval slice: one eval doc; its 8-token runs are the contamination
    * set. A train doc sharing any of them must be dropped. */
  private val s7EvalText: String =
    "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12"

  /** S7 scenario: every pipeline stage exercised, with the stateful
    * stage proven ACROSS batches —
    * batch 1: doc 1 clean survivor (src_a); doc 2 gate-dropped (too
    *   short); doc 3 clean survivor (src_b, id 3 < 50 → sampled in).
    * batch 2: doc 4 repeats doc 1's text → dedup state from batch 1
    *   drops it; doc 5 contains an eval 8-run → decontamination drops
    *   it; doc 6 clean survivor (src_a).
    * batch 3: doc 7 gate-dropped (24 copies of one token, ttr 1/24);
    *   doc 199 (src_b) sampled OUT (199 % 100 = 99 ≥ 50); doc 8 clean
    *   survivor (src_b).
    */
  private def s7Batches: Seq[Seq[DocRow]] = Seq(
    Seq(DocRow(1, "src_a", cleanText("a")),
      DocRow(2, "src_a", "too short to survive"),
      DocRow(3, "src_b", cleanText("b"))),
    Seq(DocRow(4, "src_a", cleanText("a")),
      DocRow(5, "src_b",
        (1 to 16).map(i => s"pad$i").mkString(" ") + " e2 e3 e4 e5 e6 e7 e8 e9"),
      DocRow(6, "src_a", cleanText("c"))),
    Seq(DocRow(7, "src_a", Array.fill(24)("rep").mkString(" ")),
      DocRow(199, "src_b", cleanText("d")),
      DocRow(8, "src_b", cleanText("f"))))

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

  /** s10 scenario: base holds keys {a, b}. Every drop mode exercised,
    * the keep-first state proven ACROSS batches —
    * batch 1: id 1 (a) dropped against base; ids 2 (c), 3 (d) fresh.
    * batch 2: id 4 (c) dropped by batch-1 STATE; id 5 (b) dropped
    *   against base; id 6 (e) fresh.
    * batch 3: id 7 (d) dropped by state two batches back; id 8 (f)
    *   fresh; id 9 (a) dropped against base.
    * Survivors: 2, 3, 6, 8. No batch repeats a key within itself, so
    * the winner of every key is order-independent and the output is
    * golden-hash pinnable. */
  private def s10Batches: Seq[Seq[KeyedRow]] = Seq(
    Seq(KeyedRow(1, "a"), KeyedRow(2, "c"), KeyedRow(3, "d")),
    Seq(KeyedRow(4, "c"), KeyedRow(5, "b"), KeyedRow(6, "e")),
    Seq(KeyedRow(7, "d"), KeyedRow(8, "f"), KeyedRow(9, "a")))

  /** S12 scenario: view→purchase attribution across batches. User 1's
    * 10:00 view matches purchases at 10:10 (batch 1) and 10:25 (batch
    * 2 — the join state must still hold the view one batch later);
    * the 10:40 purchase is outside the 30-min bound and must NOT
    * match. User 2's purchase at 10:05 PRECEDES their 10:06 view (no
    * match — the bound is one-sided in time) but their 10:20 purchase
    * matches it. User 3 has a view and no purchase; user 4 a purchase
    * and no view — neither emits. Inner join ⇒ exactly 3 rows. */
  private def s12Batches: Seq[Seq[EventRow]] = {
    val e = new Events
    import e.ev
    Seq(
      Seq(ev("2024-01-01 10:00:00", userId = 1, eventType = "view"),
        ev("2024-01-01 10:10:00", userId = 1, eventType = "purchase"),
        ev("2024-01-01 10:05:00", userId = 2, eventType = "purchase"),
        ev("2024-01-01 10:06:00", userId = 2, eventType = "view")),
      Seq(ev("2024-01-01 10:25:00", userId = 1, eventType = "purchase"),
        ev("2024-01-01 10:20:00", userId = 2, eventType = "purchase"),
        ev("2024-01-01 10:30:00", userId = 3, eventType = "view")),
      Seq(ev("2024-01-01 10:40:00", userId = 1, eventType = "purchase"),
        ev("2024-01-01 10:45:00", userId = 4, eventType = "purchase")))
  }

  /** S13 scenario: OUTER attribution. User 1's 10:00 view matches the
    * 10:10 purchase (emits immediately, inner-style). User 3's 10:30
    * view has NO purchase — its (view, null) row may emit only once
    * the join watermark (the MIN across both input streams — each
    * later batch therefore carries a view AND a purchase) passes
    * 11:00 = vts + the 30-min bound: batch 2's 11:30 events push the
    * watermark to 11:20, and batch 3's PROCESSING evicts-and-emits
    * the null row (eviction always lands one batch after the
    * watermark passes). Batches 4 and 5 likewise flush users 4 and
    * 5. Same-instant (pts = vts) pairs never match (strict bound),
    * so no later user creates a match. The NO-DATA micro-batch Spark
    * runs after the last data (noDataMicroBatches, on by default)
    * advances the watermark once more (→ 14:20) and flushes user 6;
    * user 7's view (bound 15:00) is genuinely still open and must
    * NOT emit. Expected: 1 match + nulls for users 3, 4, 5, 6. */
  private def s13Batches: Seq[Seq[EventRow]] = {
    val e = new Events
    import e.ev
    Seq(
      Seq(ev("2024-01-01 10:00:00", userId = 1, eventType = "view"),
        ev("2024-01-01 10:10:00", userId = 1, eventType = "purchase"),
        ev("2024-01-01 10:30:00", userId = 3, eventType = "view")),
      Seq(ev("2024-01-01 11:30:00", userId = 4, eventType = "view"),
        ev("2024-01-01 11:30:00", userId = 4, eventType = "purchase")),
      Seq(ev("2024-01-01 12:30:00", userId = 5, eventType = "view"),
        ev("2024-01-01 12:30:00", userId = 5, eventType = "purchase")),
      Seq(ev("2024-01-01 13:30:00", userId = 6, eventType = "view"),
        ev("2024-01-01 13:30:00", userId = 6, eventType = "purchase")),
      Seq(ev("2024-01-01 14:30:00", userId = 7, eventType = "view"),
        ev("2024-01-01 14:30:00", userId = 7, eventType = "purchase")))
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

    QueryDef.noOracle("s7_preprocess_stream") { (s, _) =>
      runDocScenario(s, "append", s7Batches)(docs =>
        StreamingOps.preprocessStream(docs,
          StreamingOps.shingleSetOf(Seq(s7EvalText)),
          mixRate = when(col("source") === "src_b", lit(50)).otherwise(lit(100))))
    },

    QueryDef.noOracle("s10_delta_dedup_stream") { (s, _) =>
      import s.implicits._
      val base = Seq("a", "b").toDF("key")
      runKeyedScenario(s, "append", s10Batches)(delta =>
        StreamingOps.deltaDedupStream(delta, base))
    },

    QueryDef.noOracle("s12_stream_join") { (s, _) =>
      runScenario(s, "append", s12Batches)(StreamingOps.viewPurchaseJoin(_))
    },

    QueryDef.noOracle("s13_stream_outer_join") { (s, _) =>
      runScenario(s, "append", s13Batches)(
        StreamingOps.viewPurchaseJoin(_, joinType = "left_outer"))
    }
  )
}
