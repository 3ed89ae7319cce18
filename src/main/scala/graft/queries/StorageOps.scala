package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-LAYOUT operators — the write side of the engine at scale.
  * Everything else in the library optimizes a single plan; these two
  * entries certify the layouts a 100 TB deployment pays for ONCE at
  * ingest so that every later query is cheaper:
  *
  *  - BUCKETING (w1): `bucketBy(key)` pre-shuffles a table at write
  *    time. Two tables bucketed on the join key with the same bucket
  *    count sort-merge-join with NO Exchange on either side — the
  *    shuffle a fact-fact join would otherwise pay on every single
  *    run is paid once, at write. (Broadcast covers fact-dim; bucketing
  *    is the fact-FACT answer when neither side fits an executor.)
  *  - PARTITIONING (w2): `partitionBy(col)` turns a predicate on the
  *    partition column into directory pruning — the scan never opens
  *    non-matching files, the I/O analogue of the shuffle saving.
  *
  * Both write under java.io.tmpdir with the CDC snapshots' stale-guard
  * (write once per JVM per SF, record success only AFTER the write),
  * so bench passes reuse the first write while alternating-SF test
  * runs rewrite. The ORACLE reads the raw tables — the layout must
  * never change an answer, only the plan: the driver hash-compare
  * certifies exactly that, and the plan properties (zero shuffle
  * exchanges under the bucketed join, PartitionFilters on the pruned
  * scan) are spec-asserted.
  */
object StorageOps {

  private val WarehouseBase =
    System.getProperty("java.io.tmpdir") + "/graft_warehouse"

  /** Layout key → SF dir currently materialized (success-recorded). */
  private val materializedSf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def writeIfStale(key: String, d: String)(write: => Unit): Unit =
    synchronized {
      if (materializedSf.get(key) != d) { write; materializedSf.put(key, d) }
    }

  /** Bucketed external tables for lineitem/orders on the join key.
    * `saveAsTable` is required (bucket metadata lives in the catalog);
    * `path` keeps the data external under tmpdir. Bucket counts must
    * MATCH for the exchange-free join — at real scale you size them
    * to the target parallelism (buckets ≥ cores, files ≈ buckets). */
  /** The stale-guard map is JVM-wide but bucket METADATA is per
    * session catalog — a second session in the same JVM (test suites)
    * must rewrite through `saveAsTable` to register the tables, so
    * the skip condition checks both. */
  private[queries] def ensureBucketed(s: SparkSession, d: String): Unit =
    synchronized {
      if (materializedSf.get("bucketed") == d &&
        s.catalog.tableExists("graft_lineitem_b") &&
        s.catalog.tableExists("graft_orders_b")) return
      materializedSf.remove("bucketed")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .write.mode("overwrite")
        .option("path", s"$WarehouseBase/lineitem_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_b")
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .option("path", s"$WarehouseBase/orders_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_b")
      materializedSf.put("bucketed", d)
    }

  /** The w1 join over the bucketed tables (callers ensureBucketed
    * first). Exposed for the plan spec. */
  private[queries] def bucketedJoinFrame(s: SparkSession): DataFrame =
    s.table("graft_lineitem_b")
      .join(s.table("graft_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_extendedprice"), 2).as("revenue"),
        round(sum("l_quantity"), 2).as("qty"))

  /** Partitioned events layout for w2: one directory per event_type. */
  private[queries] def ensurePartitioned(s: SparkSession, d: String): String = {
    val path = s"$WarehouseBase/events_p"
    writeIfStale("partitioned", d) {
      Tables.events(s, d)
        .select("event_id", "ts", "event_type", "value")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    }
    path
  }

  /** Time-sorted events layout for w3: range-partitioned by ts, sorted
    * within partitions, written with SMALL parquet row groups so each
    * carries a tight [min,max] ts zone — at a deployment's default
    * 128 MB row groups the same ordering yields the same skipping,
    * this just makes it observable at test scale. */
  private[queries] def ensureSorted(s: SparkSession, d: String): String = {
    val path = s"$WarehouseBase/events_s"
    writeIfStale("sorted", d) {
      // INT96 (Spark's legacy parquet timestamp encoding) carries NO
      // min/max statistics — a zone-map layout MUST write INT64
      // micros or the sort buys nothing. Set for this write only.
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = s.conf.get(key)
      try {
        s.conf.set(key, "TIMESTAMP_MICROS")
        Tables.events(s, d)
          .select("event_id", "ts", "event_type", "value")
          .repartitionByRange(4, col("ts"))
          .sortWithinPartitions("ts")
          .write.mode("overwrite")
          .option("parquet.block.size", 8 * 1024)
          .parquet(path)
      } finally s.conf.set(key, prev)
    }
    path
  }

  /** Morton (Z-order) interleave of two 8-bit dimension ranks as a
    * pure column expression (16 codegen'd shift/mask terms — no UDF):
    * bit i of `u` lands at 2i+1, bit i of `t` at 2i, so a sort by the
    * result alternates the dimensions' bits and row groups get tight
    * min/max zones on BOTH columns at once. 8 bits per dimension is
    * the practical choice (256 ranks per dim bounds the interleave
    * depth; finer ranks only refine order WITHIN zones). */
  private def morton8(u: org.apache.spark.sql.Column,
      t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(u, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftright(t, i).bitwiseAND(1), 2 * i)
    }.reduce(_ + _)

  /** Z-ORDERED events layout for w5: sorted by the Morton interleave
    * of (user_id, ts) ranks. A single-column sort (w3) gives row-group
    * skipping on ONE column; the space-filling-curve sort preserves
    * locality in BOTH dimensions, so predicates on either (or both)
    * skip row groups — the multi-dimensional data-skipping layout
    * (Delta's Z-ORDER). Dimension ranks are normalized against the
    * table's min/max (one bounded 1-row aggregate at write time). */
  private[queries] def ensureZordered(s: SparkSession, d: String): String = {
    val path = s"$WarehouseBase/events_z"
    writeIfStale("zordered", d) {
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = s.conf.get(key)
      try {
        s.conf.set(key, "TIMESTAMP_MICROS") // INT96 has no stats (w3)
        val ev = Tables.events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val b = ev.agg(min("user_id"), max("user_id"),
          min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
          .collect().head // bounded: one row of table stats
        val (u0, u1, t0, t1) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
        val uRank = least(lit(255),
          floor((col("user_id") - u0) * 256.0 / (u1 - u0 + 1))).cast("int")
        val tRank = least(lit(255),
          floor((unix_micros(col("ts")) - t0) * 256.0 / (t1 - t0 + 1))).cast("int")
        ev.withColumn("zkey", morton8(uRank, tRank))
          .repartitionByRange(4, col("zkey"))
          .sortWithinPartitions("zkey")
          .drop("zkey")
          .write.mode("overwrite")
          .option("parquet.block.size", 8 * 1024)
          .parquet(path)
      } finally s.conf.set(key, prev)
    }
    path
  }

  /** Bloom-filtered events layout for w6: written in ARRIVAL (ts)
    * order with a parquet BLOOM FILTER on user_id — the point-lookup
    * lever when the data is NOT sorted by the lookup key (w3/w5 zone
    * maps need sort locality; on a scattered key every row group's
    * [min,max] spans the domain and prunes nothing, while a bloom
    * answers "is this key possibly here?" per row group in O(1)
    * regardless of layout). Small row groups make the per-group
    * effect observable at test scale, as in w3. */
  private[queries] def ensureBloomed(s: SparkSession, d: String): String = {
    val path = s"$WarehouseBase/events_bf"
    writeIfStale("bloomed", d) {
      Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartitionByRange(4, col("ts"))
        .sortWithinPartitions("ts") // key scattered: ts order, NOT user order
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        // dictionary OFF for the key column: parquet-mr (correctly)
        // skips the bloom when a chunk is fully dictionary-encoded —
        // the dictionary already answers exact membership. The bloom
        // regime is HIGH-cardinality keys whose dictionaries overflow
        // to plain encoding; the test corpus's key space is small, so
        // this write pins that regime explicitly.
        .option("parquet.enable.dictionary#user_id", "false")
        .option("parquet.block.size", 8 * 1024)
        .parquet(path)
    }
    path
  }

  /** Date-partitioned events layout for w8: the canonical fact layout
    * (one directory per day). `repartition(event_date)` before the
    * write gives one file per date instead of files × tasks — the
    * standard ingest shape; at real scale you'd add a second
    * within-date key to bound file size. */
  private[queries] def ensureDatePartitioned(s: SparkSession, d: String): String = {
    val path = s"$WarehouseBase/events_dp"
    writeIfStale("datePartitioned", d) {
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("value"),
          to_date(col("ts")).as("event_date"))
        .repartition(col("event_date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    }
    path
  }

  /** w9: external tables over the raw parquet + computed statistics —
    * the ANALYZE is the ingest-time cost, row counts + column stats
    * land in the session catalog and every later plan uses them. */
  private[queries] def ensureAnalyzed(s: SparkSession, d: String): Unit =
    synchronized {
      val have = materializedSf.get("analyzed") == d &&
        s.catalog.tableExists("graft_li_s") &&
        s.catalog.tableExists("graft_ord_s") &&
        s.catalog.tableExists("graft_cust_s")
      if (have) return
      materializedSf.remove("analyzed")
      Seq("graft_li_s", "graft_ord_s", "graft_cust_s")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      s.sql(s"CREATE TABLE graft_li_s USING parquet LOCATION '$d/lineitem.parquet'")
      s.sql(s"CREATE TABLE graft_ord_s USING parquet LOCATION '$d/orders.parquet'")
      s.sql(s"CREATE TABLE graft_cust_s USING parquet LOCATION '$d/customer.parquet'")
      s.sql("ANALYZE TABLE graft_li_s COMPUTE STATISTICS")
      s.sql("ANALYZE TABLE graft_ord_s COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql("ANALYZE TABLE graft_cust_s COMPUTE STATISTICS FOR ALL COLUMNS")
      materializedSf.put("analyzed", d)
    }

  /** The w9 query in its deliberately-worst syntactic order. */
  private[queries] def cboFrame(s: SparkSession): DataFrame =
    s.sql(
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_items,
        |       ROUND(SUM(l_extendedprice), 2) AS revenue
        |FROM graft_li_s JOIN graft_ord_s ON l_orderkey = o_orderkey
        |JOIN graft_cust_s ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin)

  /** Run `body` with CBO + join reorder on, restoring session defaults
    * after — plans must be FORCED (collected / inspected) inside. */
  private[queries] def withCbo[T](s: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> s.conf.get(k))
    keys.foreach(k => s.conf.set(k, "true"))
    try body finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }

  /** The w8 join (callers get DPP from the session default rule set).
    * Exposed for the plan spec. */
  private[queries] def dppJoinFrame(s: SparkSession, d: String): DataFrame = {
    val fact = s.read.parquet(ensureDatePartitioned(s, d))
    val dim = Tables.events(s, d)
      .select(to_date(col("ts")).as("event_date")).distinct()
      .filter(dayofmonth(col("event_date")) % 7 === 0)
    fact.join(broadcast(dim), Seq("event_date"))
      .groupBy("event_date")
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
  }

  val defs: Seq[QueryDef] = Seq(

    // w1: fact-fact join over tables BUCKETED on the join key — the
    // write-once/join-free-forever layout. The oracle joins the raw
    // tables: bucketing must change the plan (no Exchange under the
    // sort-merge join — spec-asserted with broadcast disabled), never
    // the answer. In this JVM the first call pays the two bucketed
    // writes (the ingest cost a cluster pays once); later calls reuse.
    QueryDef("w1_bucketed_join",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |       ROUND(SUM(l_extendedprice), 2) AS revenue,
        |       ROUND(SUM(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      ensureBucketed(s, d)
      bucketedJoinFrame(s)
        .orderedSmall(col("o_orderpriority"))
    },

    // w2: partition-pruned scan — the predicate on the partition
    // column resolves to directory pruning (PartitionFilters in the
    // scan, spec-asserted), so the read touches one type's files
    // regardless of corpus size. The oracle filters the raw table.
    QueryDef("w2_partition_pruned",
      """SELECT TIME_BUCKET(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS h,
        |       CAST(COUNT(*) AS BIGINT) AS c, ROUND(SUM(value), 2) AS sv
        |FROM events WHERE event_type = 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val path = ensurePartitioned(s, d)
      s.read.parquet(path)
        .filter(col("event_type") === "click")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
        .orderedRows(col("h")) // rows scale with time range
    },

    // w3: zone-map (min/max statistics) scan over a TIME-SORTED
    // layout — the third ingest-time layout lever after bucketing (w1)
    // and directory partitioning (w2). Sorting by ts at write time
    // makes every parquet row group's [min,max] ts interval tight and
    // disjoint, so a pushed time-range predicate skips whole row
    // groups at the footer — the scan does I/O proportional to the
    // QUERY WINDOW, not the table (here: 1 day of a 30-day corpus ⇒
    // ~1/30 of the groups decode). The predicate must reach the scan
    // as PushedFilters for the skip to happen; spec-asserted, along
    // with a footer audit that the matching row groups are a small
    // fraction. Oracle reads the raw table: layout changes I/O, never
    // answers.
    QueryDef("w3_zonemap_scan",
      """SELECT TIME_BUCKET(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS h,
        |       CAST(COUNT(*) AS BIGINT) AS c, ROUND(SUM(value), 2) AS sv
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-16 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val path = ensureSorted(s, d)
      s.read.parquet(path)
        .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
        .orderedSmall(col("h")) // ≤ 24 hourly rows
    },

    // w4: SMALL-FILE COMPACTION — the fourth ingest-side lever, and
    // the canonical 100 TB ingest pathology: a streaming/micro-batch
    // writer leaves thousands of KB-sized files per day, and every
    // later scan pays per-file open/footer/schedule costs that dwarf
    // the data. The fix is a periodic compaction job: read the
    // fragmented layout, `repartition(target)` (compaction WANTS the
    // round-robin shuffle — that is the rewrite), write files sized
    // for the scan path (`maxRecordsPerFile` caps any straggler
    // partition). The entry materializes a 64-file fragmented copy of
    // the events slice, compacts it to 2 files, and aggregates over
    // the COMPACTED layout; the oracle aggregates the raw table —
    // compaction must change file counts (spec-asserted ≥ 16×
    // reduction), never an answer.
    QueryDef("w4_compacted_scan",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c,
        |       ROUND(SUM(value), 2) AS sv
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val path = ensureCompacted(s, d)
      s.read.parquet(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
        .orderedSmall(col("event_type")) // one row per type: bounded
    },

    // w5: Z-ORDER (space-filling-curve) layout — multi-dimensional
    // data skipping, the layout lever for the dashboard/point-lookup
    // shape "one user band × one time window" that neither w2's
    // single-column partitioning nor w3's single-column sort serves:
    // sorting by ts leaves user_id zones spanning the full domain
    // (and vice versa), while the Morton-interleaved sort keeps row
    // groups tight in BOTH dimensions, so each predicate skips groups
    // independently and their conjunction multiplies (spec-audited at
    // the parquet footers). Oracle reads the raw table: the curve
    // changes I/O, never answers.
    QueryDef("w5_zorder_scan",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c,
        |       ROUND(SUM(value), 2) AS sv
        |FROM events
        |WHERE user_id BETWEEN 4 AND 9
        |  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val path = ensureZordered(s, d)
      s.read.parquet(path)
        .filter(col("user_id").between(4, 9) &&
          col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
        .orderedSmall(col("event_type")) // one row per type: bounded
    },

    // w6: BLOOM-FILTERED point lookup — the sixth storage lever, for
    // the key the layout is NOT sorted by: zone maps (w3/w5) prune by
    // [min,max] locality, which a scattered key never has, while a
    // per-row-group bloom filter answers the membership probe
    // directly — equality/IN predicates skip groups whose bloom says
    // "definitely absent" (no false negatives, so never a wrong
    // answer; FPs cost a decode, not correctness — d6's Bloom
    // contract at the storage layer). The probe list mixes a present
    // and an absent key: the absent one is the bloom's whole value
    // (an unindexed scan decodes every group to learn "not here").
    QueryDef("w6_bloom_scan",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c,
        |       ROUND(SUM(value), 2) AS sv
        |FROM events WHERE user_id IN (7, 999999)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val path = ensureBloomed(s, d)
      s.read.parquet(path)
        .filter(col("user_id").isin(7, 999999))
        .groupBy("user_id")
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
        .orderedSmall(col("user_id")) // probe-list arity: bounded
    },

    // w7: ROW-GROUP sizing — the seventh layout lever, for SCAN
    // PARALLELISM rather than skipping: a parquet file is splittable
    // only at row-group boundaries, so a single-row-group file (the
    // whole bench corpus's shape — and the measured reason the sf0.1
    // per-query gap vs an intra-file-parallel engine exists at all,
    // BASELINE §5b) decodes as ONE task no matter how many cores the
    // cluster has. Writing the same table with bounded row groups
    // (parquet.block.size; here ~1 MB → 10+ groups in one file) lets
    // the standard byte-range split assign each task a disjoint set of
    // groups — intra-FILE parallelism with zero extra files, the knob
    // a 100 TB ingest sets so downstream scans saturate executors
    // (row groups also bound the memory a reader materializes). The
    // oracle aggregates the raw table: the layout changes I/O shape,
    // never answers; the spec audits the footer (≥ 8 groups, one
    // file) and that the scan yields > 1 non-empty partition.
    QueryDef("w7_rowgroup_scan",
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS c,
        |       ROUND(SUM(l_quantity), 2) AS sq
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val path = ensureRowGrouped(s, d)
      s.read.parquet(path)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("c"), round(sum("l_quantity"), 2).as("sq"))
        .orderedSmall(col("l_returnflag"), col("l_linestatus"))
    },

    // w9: COST-BASED join reordering (r12) — the ANALYZE-once planning
    // lever: table/column statistics are computed at ingest like every
    // other w-family layout, and from then on Catalyst's CBO reorders
    // every join over those tables by estimated size instead of
    // syntactic order. The query deliberately writes the WORST order
    // (fact ⋈ fact ⋈ selective dim); with stats + CBO the optimizer
    // builds (orders ⋈ customer-filtered) first and joins lineitem
    // last — at 100 TB the difference between shuffling the biggest
    // table through two joins or one. Spec-asserted on the optimized
    // plan (lineitem leaves the innermost join exactly when CBO+stats
    // are on); the result is collected INSIDE the CBO conf window
    // (bounded: one row per segment) so the session defaults stay
    // untouched for every other entry. Oracle: the same join over raw
    // tables — stats change plans, never answers.
    QueryDef("w9_cbo_reorder",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_items,
        |       ROUND(SUM(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      ensureAnalyzed(s, d)
      import scala.jdk.CollectionConverters._
      val rows = withCbo(s) { cboFrame(s).collect().toSeq }
      s.createDataFrame(rows.asJava, cboFrame(s).schema)
        .orderedSmall(col("c_mktsegment"))
    },

    // w8: DYNAMIC partition pruning — w2's runtime sibling, and the
    // pruning shape 100 TB fact-dim joins actually hit: the predicate
    // lives on the DIM side (here: every 7th calendar day), so static
    // pruning sees nothing to push to the date-partitioned fact.
    // Catalyst's PartitionPruning rule inserts a DynamicPruning
    // subquery on the fact's partition column that REUSES the dim's
    // broadcast exchange — at run time the fact scan lists only the
    // dim-selected directories (4 of 30 here; 4 of ~36,500 on a
    // 100-year corpus) before reading a byte. Spec-asserted on the
    // scan's partitionFilters; the oracle joins the raw table — the
    // layout+rule change I/O, never an answer.
    QueryDef("w8_dpp_prune",
      """WITH dim AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date
        |            FROM events),
        |sel AS (SELECT event_date FROM dim WHERE day(event_date) % 7 = 0),
        |fact AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date, value
        |         FROM events)
        |SELECT event_date, CAST(COUNT(*) AS BIGINT) AS c, ROUND(SUM(value), 2) AS sv
        |FROM fact JOIN sel USING (event_date)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      dppJoinFrame(s, d)
        .orderedSmall(col("event_date")) // ≤ 5 calendar days/month
    }
  )

  /** w7 layout: one file, many ~1 MB row groups (vs the corpus's
    * single-group files). */
  private[queries] def ensureRowGrouped(s: SparkSession, d: String): String = {
    val path = s"$WarehouseBase/lineitem_rg"
    writeIfStale("rowgrouped", d) {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
          "l_returnflag", "l_linestatus")
        .coalesce(1) // ONE file: parallelism must come from row groups
        .write.mode("overwrite")
        // block.size bounds the IN-MEMORY buffered group (~30B/row
        // here): 256 KB ≈ 7.5 k-row groups — 8 at sf0.01, ~80 at sf0.1
        .option("parquet.block.size", (256L << 10).toString)
        .parquet(path)
    }
    path
  }

  /** w4 layouts: a deliberately fragmented 64-file write (the
    * micro-batch ingest shape) and its 2-file compaction. Returns the
    * compacted path; [[fragmentedFileCount]]/[[compactedFileCount]]
    * expose the layouts to the plan spec. */
  private[queries] def ensureCompacted(s: SparkSession, d: String): String = {
    val frag = s"$WarehouseBase/events_frag"
    val comp = s"$WarehouseBase/events_comp"
    writeIfStale("compacted", d) {
      Tables.events(s, d)
        .select("event_id", "ts", "event_type", "value")
        .repartition(64) // the small-files pathology, materialized
        .write.mode("overwrite").parquet(frag)
      s.read.parquet(frag)
        .repartition(2)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1000000)
        .parquet(comp)
    }
    comp
  }

  private def parquetFileCount(path: String): Int =
    Option(new java.io.File(path).listFiles()).fold(0)(
      _.count(f => f.getName.endsWith(".parquet")))

  private[queries] def fragmentedFileCount(s: SparkSession, d: String): Int = {
    ensureCompacted(s, d)
    parquetFileCount(s"$WarehouseBase/events_frag")
  }

  private[queries] def compactedFileCount(s: SparkSession, d: String): Int = {
    ensureCompacted(s, d)
    parquetFileCount(s"$WarehouseBase/events_comp")
  }
}
