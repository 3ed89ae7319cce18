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

  test("s24 golden: dropDuplicatesWithinWatermark dedups within the delay, re-emits after expiry") {
    // THE behavior that distinguishes the state-bounded API from plain
    // dropDuplicates: a duplicate inside the delay is dropped, and a
    // duplicate arriving AFTER its key's state expired (watermark past
    // firstTs + delay) is emitted AGAIN — bounded state, bounded
    // guarantee. Keys here are user ids; delay 10 minutes.
    val in = MemoryStream[EventRow]
    val out = runToMemory("s24g",
      in.toDF().withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("user_id")
        .select(col("user_id"), col("ts")),
      "append", stream = Some(in), data = Seq(
        // batch 1: first occurrences of users 1 and 2 (wm still unset)
        Seq(ev("2024-01-01 10:00:00", userId = 1),
          ev("2024-01-01 10:02:00", userId = 2)),
        // batch 2: user-2 dup INSIDE the delay (wm 09:52 from batch 1)
        // → dropped; the 10:30 row pushes the wm to 10:20, past
        // user 1's 10:00 + 10 min → user 1's state expires
        Seq(ev("2024-01-01 10:05:00", userId = 2),
          ev("2024-01-01 10:30:00", userId = 3)),
        // batch 3: user-1 dup AFTER expiry (10:25 > wm 10:20, not
        // late) → RE-EMITTED
        Seq(ev("2024-01-01 10:25:00", userId = 1))))
    val got = out.select("user_id").as[Long].collect().toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == Map(1L -> 2, 2L -> 1, 3L -> 1), got.toString)
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

  test("s29 sampleFold: split-invariant, equals batch bottom-k, state bounded by k") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, xxhash64}
    val rows = (0L until 400L).map(i =>
      (i * 37 % 1000, i % 20, s"t${i % 3}")) // ids with gaps, non-monotone
    val all = rows.toDF("event_id", "user_id", "event_type")
    val k = 50
    def fold(chunks: Seq[DataFrame]): Set[(Long, Long, String)] = {
      var st: Option[DataFrame] = None
      var maxState = 0L
      chunks.foreach { c =>
        st = Some(StreamingOps.sampleFold(st, c, k).localCheckpoint())
        maxState = math.max(maxState, st.get.count())
      }
      assert(maxState <= k, "state must never exceed k rows")
      st.get.select("event_id", "user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    }
    val batchTopK = all.withColumn("h", xxhash64(col("event_id")))
      .orderBy(col("h"), col("event_id")).limit(k)
      .select("event_id", "user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(batchTopK.size == k)
    // any chunking — 1, 4, 13 uneven slices — converges to the batch answer
    for (n <- Seq(1, 4, 13)) {
      val chunks = rows.grouped(math.max(1, rows.length / n))
        .map(_.toDF("event_id", "user_id", "event_type")).toSeq
      assert(fold(chunks) == batchTopK, s"chunking n=$n")
    }
    // reversed feed order too: priorities are row-pure, order-free
    val rev = rows.reverse.grouped(100)
      .map(_.toDF("event_id", "user_id", "event_type")).toSeq
    assert(fold(rev) == batchTopK, "reversed arrival")
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

  test("s17 dynamic sessions: purchase extends the gap; state crosses batches; sentinel flushes") {
    def ts(t: String) = Timestamp.valueOf(t).getTime
    val in = MemoryStream[EventRow]
    val endRow = EventRow(-1L, Timestamp.valueOf("2024-01-02 00:00:00"), 1L, "__end__", 0.0, "")
    val out = runToMemory("s17t",
      StreamingOps.dynamicSessions(in.toDS()).toDF(), "append",
      stream = Some(in),
      data = Seq(
        // batch 1: session A opens (10:00, 10:20 — 20 min ≤ 30 min)
        Seq(ev("2024-01-01 10:00:00"), ev("2024-01-01 10:20:00")),
        // batch 2: 11:30 is 70 min after a click → session A closes,
        // B opens; 11:40 purchase joins B
        Seq(ev("2024-01-01 11:30:00"), ev("2024-01-01 11:40:00", eventType = "purchase")),
        // batch 3: 12:30 is 50 min after a PURCHASE (≤ 60) → still B;
        // 13:40 is 70 min after a click → B closes, C opens
        Seq(ev("2024-01-01 12:30:00"), ev("2024-01-01 13:40:00")),
        // sentinel: C flushes without opening anything
        Seq(endRow)))
    val got = out.select("user_id", "start_ms", "end_ms", "n_events", "n_purchases")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 2L, 0L),
      (1L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:30:00"), 3L, 1L),
      (1L, ts("2024-01-01 13:40:00"), ts("2024-01-01 13:40:00"), 1L, 0L)))
  }

  test("s6b pattern: update log equals in-memory per-batch cumulative replay") {
    // the promoted s6b oracle asserts exactly this shape over the real
    // events table; pin the mechanism on a randomized feed — one
    // update row per (user, batch touched) carrying the cumulative
    // count at that batch's end
    val rnd = new scala.util.Random(11)
    val batches = Seq.fill(4)(Seq.fill(8)(
      ev(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d",
        userId = rnd.nextInt(3) + 1)))
    val in = MemoryStream[EventRow]
    val out = runToMemory("s6b_t", StreamingOps.runningCounter(in.toDS()).toDF(),
      "update", stream = Some(in), data = batches)
    val got = out.as[(Long, Long)].collect().sorted.toSeq
    val cum = collection.mutable.Map.empty[Long, Long]
    val expected = batches.flatMap { b =>
      b.groupBy(_.user_id).toSeq.map { case (u, rs) =>
        cum(u) = cum.getOrElse(u, 0L) + rs.size
        (u, cum(u))
      }
    }.sorted
    assert(got == expected)
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

  test("S7 preprocessing stream equals the batch pipeline on the same docs") {
    import org.apache.spark.sql.expressions.Window
    // Streaming: 9 docs over 3 batches through preprocessStream.
    val docs = Seq(
      DocRow(1, "src_a", (1 to 26).map(i => s"a$i").mkString(" ")),
      DocRow(2, "src_a", "too short to survive"),
      DocRow(3, "src_b", (1 to 26).map(i => s"b$i").mkString(" ")),
      DocRow(4, "src_a", (1 to 26).map(i => s"a$i").mkString(" ")), // dup of 1
      DocRow(5, "src_b",
        (1 to 16).map(i => s"pad$i").mkString(" ") + " e2 e3 e4 e5 e6 e7 e8 e9"),
      DocRow(6, "src_a", (1 to 26).map(i => s"c$i").mkString(" ")),
      DocRow(7, "src_a", Array.fill(24)("rep").mkString(" ")),
      DocRow(199, "src_b", (1 to 26).map(i => s"d$i").mkString(" ")),
      DocRow(8, "src_b", (1 to 26).map(i => s"f$i").mkString(" ")))
    val shingles = StreamingOps.shingleSetOf(
      Seq("e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12"))
    val mixRate = when(col("source") === "src_b", lit(50)).otherwise(lit(100))
    val in = MemoryStream[DocRow]
    val q = StreamingOps.preprocessStream(in.toDF(), shingles, mixRate)
      .writeStream.format("memory").queryName("s7spec").outputMode("append")
      .start()
    docs.grouped(3).foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("s7spec").as[(Long, String, Long)].collect().toSet
    spark.catalog.dropTempView("s7spec")
    // Batch twin: p1's semantics over the same rows — keep-first =
    // min doc_id, which equals arrival order here by construction.
    val toks = split(col("text"), " ")
    val batch = docs.toDF()
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("ttr", size(array_distinct(toks)) * lit(1.0) / size(toks))
      .filter(col("n_tok") >= 24 && col("ttr") >= 0.30)
      .filter(pmod(col("doc_id"), lit(100)) < mixRate)
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(lower(col("text")))).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), lower(col("text")).as("text"),
        col("n_tok"))
      .as[(Long, String, String, Long)]
      .filter { t: (Long, String, String, Long) =>
        !StreamingOps.shingleSetOf(Seq(t._3)).exists(shingles.contains)
      }
      .map(t => (t._1, t._2, t._4))
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(1L, 3L, 6L, 8L))
  }

  test("s10 delta-dedup stream equals bloomDeltaDedup on the flattened batches") {
    import graft.streaming.KeyedRow
    // Keys a/b sit in the static base; c repeats across batches 1→2
    // and d across 1→3, so survivors prove the keep-first state
    // carries over micro-batch boundaries (not reset per batch).
    val batches = Seq(
      Seq(KeyedRow(1, "a"), KeyedRow(2, "c"), KeyedRow(3, "d")),
      Seq(KeyedRow(4, "c"), KeyedRow(5, "b"), KeyedRow(6, "e")),
      Seq(KeyedRow(7, "d"), KeyedRow(8, "f"), KeyedRow(9, "a")))
    val base = Seq("a", "b").toDF("key")
    val in = MemoryStream[KeyedRow]
    val q = StreamingOps.deltaDedupStream(in.toDF(), base)
      .writeStream.format("memory").queryName("s10spec").outputMode("append")
      .start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("s10spec").select("id", "key")
      .as[(Long, String)].collect().toSet
    spark.catalog.dropTempView("s10spec")
    assert(streamed.map(_._1) == Set(2L, 3L, 6L, 8L))
    // Batch twin: same rows through the Bloom-prefiltered batch
    // operator (keep-first = min id, which equals arrival order here).
    val batch = graft.queries.DedupOps.bloomDeltaDedup(
        base.withColumnRenamed("key", "k"),
        batches.flatten.map(r => (r.id, r.key)).toDF("id", "k"),
        "k", "id")
      .select("id", "k").as[(Long, String)].collect().toSet
    assert(streamed == batch)
  }

  test("S12 stream-stream join equals batch join; bound and state both honored") {
    val batches = Seq(
      Seq(ev("2024-01-01 10:00:00", userId = 1, eventType = "view"),
        ev("2024-01-01 10:10:00", userId = 1, eventType = "purchase"),
        ev("2024-01-01 10:05:00", userId = 2, eventType = "purchase"),
        ev("2024-01-01 10:06:00", userId = 2, eventType = "view")),
      // 10:25 must match the 10:00 view BUFFERED FROM BATCH 1
      Seq(ev("2024-01-01 10:25:00", userId = 1, eventType = "purchase"),
        ev("2024-01-01 10:20:00", userId = 2, eventType = "purchase")),
      // 10:40 is 40 min after the view — outside the 30-min bound
      Seq(ev("2024-01-01 10:40:00", userId = 1, eventType = "purchase")))
    val in = MemoryStream[EventRow]
    val q = StreamingOps.viewPurchaseJoin(in.toDF())
      .writeStream.format("memory").queryName("s12spec").outputMode("append")
      .start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("s12spec").select("view_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    spark.catalog.dropTempView("s12spec")
    // same operator over the same rows as a BATCH self-join
    val batch = StreamingOps.viewPurchaseJoin(
        batches.flatten.toDF())
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.size == 3, s"streamed=$streamed")
  }

  test("S13 outer stream join: nulls only after watermark close; open views withheld") {
    val v1 = ev("2024-01-01 10:00:00", userId = 1, eventType = "view")
    val p1 = ev("2024-01-01 10:10:00", userId = 1, eventType = "purchase")
    val v3 = ev("2024-01-01 10:30:00", userId = 3, eventType = "view")
    val v4 = ev("2024-01-01 11:30:00", userId = 4, eventType = "view")
    val p4 = ev("2024-01-01 11:30:00", userId = 4, eventType = "purchase")
    val in = MemoryStream[EventRow]
    val q = StreamingOps.viewPurchaseJoin(in.toDF(), joinType = "left_outer")
      .writeStream.format("memory").queryName("s13spec").outputMode("append")
      .start()
    in.addData(Seq(v1, p1, v3)); q.processAllAvailable()
    // watermark still at batch 1's 10:10 purchase − 10 min: user 3's
    // unmatched view must NOT have emitted yet
    val early = spark.table("s13spec")
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(early == Set((v1.event_id, Some(p1.event_id))), s"early=$early")
    in.addData(Seq(v4, p4)); q.processAllAvailable()
    q.stop()
    // both sides passed 11:30 → watermark 11:20 closes user 3's
    // 11:00 bound (the no-data batch flushes it); user 4's 11:30
    // view is still open and stays withheld
    val late = spark.table("s13spec")
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    spark.catalog.dropTempView("s13spec")
    assert(late == Set((v1.event_id, Some(p1.event_id)), (v3.event_id, None)),
      s"late=$late")
  }

  test("s22 chained windows: TWO stateful operators, incremental emission") {
    val in = MemoryStream[EventRow]
    val chained = in.toDF()
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(window(col("window"), "30 minutes").as("w30"))
      .agg(count(lit(1)).as("active_buckets"), sum("c").as("n"))
      .select(col("w30.start").as("w30_start"), col("active_buckets"), col("n"))
    val q = chained.writeStream.format("memory").queryName("s22t")
      .outputMode("append").start()
    val emitted = scala.collection.mutable.ListBuffer.empty[Int]
    try {
      // batch 1: three users across two 10-min buckets of [10:00,10:30)
      in.addData(Seq(ev("2024-01-01 10:01:00", userId = 1),
        ev("2024-01-01 10:02:00", userId = 2),
        ev("2024-01-01 10:12:00", userId = 1)))
      q.processAllAvailable()
      emitted += spark.table("s22t").count().toInt
      // batch 2: watermark → 10:45 closes [10:00,10:30) — the rollup
      // row must emit NOW, mid-stream, not at end of replay
      in.addData(Seq(ev("2024-01-01 10:45:00", userId = 3)))
      q.processAllAvailable()
      emitted += spark.table("s22t").count().toInt
      // batch 3: far sentinel closes [10:30,11:00)
      in.addData(Seq(ev("2024-01-01 12:00:00", userId = 9)))
      q.processAllAvailable()
      // the ONE query ran BOTH aggregations statefully
      assert(q.lastProgress.stateOperators.length == 2,
        s"state ops: ${q.lastProgress.stateOperators.map(_.operatorName).mkString(",")}")
    } finally q.stop()
    assert(emitted.toList == List(0, 1)) // incremental, watermark-gated
    val got = spark.table("s22t")
      .as[(Timestamp, Long, Long)].collect().toSet
    // [10:00,10:30): buckets (10:00,u1)(10:00,u2)(10:10,u1) → 3 buckets, 3 events
    // [10:30,11:00): (10:40,u3) → 1 bucket, 1 event
    assert(got == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 3L, 3L),
      (Timestamp.valueOf("2024-01-01 10:30:00"), 1L, 1L)))
    spark.catalog.dropTempView("s22t")
  }

  test("s23 transformWithState: named state carries across batches on RocksDB") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[EventRow]
      val q = StreamingOps.runningStatsTws(in.toDS()).toDF()
        .writeStream.format("memory").queryName("s23t")
        .outputMode("update").start()
      try {
        in.addData(Seq(ev("2024-01-01 10:00:00", userId = 1, value = 1.5),
          ev("2024-01-01 10:01:00", userId = 1, value = 2.0),
          ev("2024-01-01 10:02:00", userId = 2, value = 10.0)))
        q.processAllAvailable()
        in.addData(Seq(ev("2024-01-01 10:03:00", userId = 1, value = 0.25)))
        q.processAllAvailable()
        // the v2 API ran on RocksDB (its custom metrics prove it)
        assert(q.lastProgress.stateOperators.head
          .customMetrics.keySet().toString.contains("rocksdb"))
      } finally q.stop()
      val got = spark.table("s23t").as[(Long, Long, Long)].collect().toSet
      // user 1: batch1 (2 rows, 350 cents) then batch2 carries state
      // forward (3 rows, 375 cents) — NOT a per-batch reset
      assert(got == Set((1L, 2L, 350L), (2L, 1L, 1000L), (1L, 3L, 375L)))
      spark.catalog.dropTempView("s23t")
    } finally spark.conf.set(key, prev)
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
