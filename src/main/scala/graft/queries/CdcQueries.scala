package graft.queries

import graft.QueryDef
import graft.QueryDef.SmallOrdered
import graft.cdc._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC surface C1–C6 (reference parity) as driver-contract entries.
  * Input is the deterministic synthetic binlog fixture (FIXTURES.md §2
  * dialect) materialized to tmp.
  *
  * C1/C5 carry real DuckDB oracles (SURVEY §2.3): the parse output's
  * scalar columns are side-written to a parquet snapshot that the
  * oracle SQL reads via read_parquet, so DuckDB independently
  * re-aggregates the counts (c1) and re-expresses every engine filter
  * as a SQL WHERE clause (c5). C2/C3/C6 render SQL *text* — no SQL
  * oracle can re-render a binlog, so they stay rows-only here with
  * byte-parity against the executed reference in ScalaTest/ref_parity.
  *
  * Fixture size scales with the requested SF dir so the bench run
  * (sf0.1) measures the BASELINE.md §1 workload: 100k events, 1:1:1
  * insert/update/delete on a 3-column PK table.
  */
object CdcQueries {

  /** Rotated-binlog fixture: bench (sf0.1) = 100k events over 8 files
    * (8 parse tasks — files are the parallelism unit); t-gates = 10k
    * over 4. */
  private def fixturePath(dir: String): String =
    if (dir.contains("0.1")) BinlogFixture.materializeDir("dml_100k", 8, 12500)
    else BinlogFixture.materializeDir("dml_10k", 4, 2500)

  /** One SF-AGNOSTIC snapshot path: the oracle SQL is a static string,
    * so the engine writes whatever fixture the current SF parses to
    * THIS path and DuckDB reads the same one — sf0.1's 100k-event run
    * is then oracle-checked too, not just the sf0.01 gate (hardcoding
    * the 10k path here was an r5 latent mismatch at sf0.1). The oracle
    * compare must follow ITS OWN Verify run (the existing contract —
    * Verify rewrites /tmp state per process); within a JVM the
    * snapshot tracks the LAST SF WRITTEN and rewrites on change, so
    * alternating SFs (shared-JVM test runs) never serve stale data,
    * while Bench's repeated same-SF passes reuse the first write. */
  private val OracleSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_events_cur"

  /** c15 raw-event snapshot (seq/op/ddl scalars) for the evolution
    * oracle. */
  private val EvolveSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_evolve_snap"

  /** c16 flattened-image snapshot for the envelope oracle. */
  private val EnvelopeSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_envelope_snap"

  /** c19 raw-event snapshot (the rotated-directory evolve fixture). */
  private val EvolveStreamSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_evolve_stream_snap"

  /** SF dir currently materialized at the named snapshot path, or null. */
  private val snapshotSf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def writeSnapshotIfStale(path: String, d: String)(
      write: => Unit): Unit =
    synchronized {
      // Record the SF only AFTER the write succeeds: if the parquet
      // write throws (disk full, interrupted run), the map must not
      // claim the snapshot is current, or every later call in this JVM
      // would skip the rewrite and the oracle would read stale bytes.
      if (snapshotSf.get(path) != d) { write; snapshotSf.put(path, d) }
    }

  /** Parse the fixture and side-write the scalar event columns for the
    * DuckDB oracle; returns the live parsed frame. */
  private def parsedWithSnapshot(s: SparkSession, d: String): DataFrame = {
    val events = CdcJob.parse(s, fixturePath(d))
    writeSnapshotIfStale(OracleSnapshot, d) {
      events.select("file", "seq", "start_pos", "stop_pos", "ts", "db", "table", "op")
        .write.mode("overwrite").parquet(OracleSnapshot)
    }
    events
  }

  /** Rotated BINARY binlog fixture (format v4 + CRC32, written by
    * BinlogBinaryFixture): 2 files × n events, 1:1:1 mix. */
  private def binFixturePath(dir: String): String = {
    val perFile = if (dir.contains("0.1")) 12500 else 2500
    // v2: dir name versions with the fixture byte format (v2 = real
    // 5.6.1+ server-version string) so a stale cached dir from an
    // older writer never feeds the decoder
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_binbinlogdir_v2_$perFile")
    if (!java.nio.file.Files.isDirectory(p)) {
      val tmp = java.nio.file.Files.createTempDirectory(p.getParent, "graft_binbinlog")
      import graft.sources.BinlogBinaryFixture._
      for (f <- 0 until 2) {
        val events: Seq[Ev] = (0 until perFile).map { i =>
          i % 3 match {
            case 0 => Insert(i, s"name_$i",
              if (i % 7 == 0) None else Some(i % 100 + 0.5))
            case 1 => Update((i, s"name_$i", Some(1.5)),
              (i, s"renamed_$i", Some(2.5)))
            case _ => Delete(i, s"renamed_$i", Some(2.5))
          }
        }
        val (bytes, _) = render(events)
        java.nio.file.Files.write(tmp.resolve(f"binlog.$f%06d"), bytes)
      }
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    p.toString
  }

  private val BinOracleSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_binevents_cur"

  /** c8's event snapshot (fixture is SF-independent: c8 certifies
    * parse SHAPES, not volume — the throughput workload is c2's). */
  private val StressOracleSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_stressevents_cur"

  /** c9's flattened-image snapshot (same stress fixture as c8). */
  private val StateOracleSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_stateevents_cur"

  /** c24's flattened-image snapshot (the SELF-CONSISTENT fixture —
    * flashback soundness needs true before images; see
    * BinlogFixture.consistentStreamParts). */
  private val FlashOracleSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_flashevents_cur"

  /** c25's raw-event snapshot: the evolve fixture WITH positional
    * images (ords/vals arrays), so the oracle can re-derive the final
    * evolved state name-by-name from the log alone. */
  private val EvolveApplySnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_evolveapply_snap"

  /** c25/c26 shared oracle: the final evolved state re-derived
    * INDEPENDENTLY from the raw positional images — last action per
    * key, each surviving cell named by which ALTER introduced its
    * ordinal strictly before the event. */
  private lazy val EvolveApplyOracleSql =
    s"""WITH ev AS (SELECT * FROM read_parquet('$EvolveApplySnapshot/*.parquet')),
         |adds AS (SELECT file, seq,
         |    regexp_extract(ddl, 'add column ([A-Za-z0-9_]+)', 1) AS c,
         |    ROW_NUMBER() OVER (ORDER BY file, seq) + 2 AS ord
         |  FROM ev WHERE op = 'ddl' AND ddl LIKE '%add column%'),
         |dml AS (SELECT * FROM ev
         |        WHERE op IN ('insert','update','delete')
         |          AND db = 'appdb' AND "table" = 'evolve'),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk,
         |         CAST(beforeVals[list_position(beforeOrds, 1)] AS BIGINT) AS id,
         |         NULL AS ords, NULL AS vals, 0 AS keep
         |  FROM dml WHERE op IN ('update','delete') AND len(beforeOrds) > 0
         |  UNION ALL
         |  SELECT file, seq, 1,
         |         CAST(afterVals[list_position(afterOrds, 1)] AS BIGINT),
         |         afterOrds, afterVals, 1
         |  FROM dml WHERE op IN ('insert','update') AND len(afterOrds) > 0),
         |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
         |           ORDER BY file DESC, seq DESC, rnk DESC) AS rn FROM acts),
         |live AS (SELECT * FROM last WHERE rn = 1 AND keep = 1),
         |cells AS (SELECT file, seq, id,
         |            unnest(ords) AS ord, unnest(vals) AS val FROM live),
         |named AS (SELECT c.id, c.val,
         |    CASE WHEN c.ord = 2 THEN 'a'
         |         ELSE (SELECT a.c FROM adds a WHERE a.ord = c.ord
         |               AND (a.file < c.file
         |                    OR (a.file = c.file AND a.seq < c.seq)))
         |    END AS colname
         |  FROM cells c WHERE c.ord >= 2)
         |SELECT id, colname, val AS value FROM named
         |ORDER BY id, colname""".stripMargin

  /** c11's streaming parquet sink + its checkpoint. */
  private val SinkPath =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_sink_cur"
  private val SinkCkpt =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_sink_ckpt_cur"

  /** c12's (id, json) snapshot — the raw JSON text recovered from the
    * decoded after-images, which DuckDB re-queries with its own JSON
    * extractor. */
  private val JsonOracleSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_jsonevents_cur"

  /** c14's partitioned stress-fixture event lake (p_db/p_table dirs,
    * the writeEventLake layout) — both the engine's pruned streaming
    * read and DuckDB's partition-glob oracle consume it. */
  private val StressLakePath =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_stresslake_cur"

  /** c13's (gtid, op, …) snapshot of the UNFILTERED gtid-framed
    * stream — DuckDB re-applies the GTID-interval filter to it. */
  private val GtidSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_gtidevents_cur"

  /** The fixture SID (BinlogBinaryFixture writes 0xA0..0xAF). */
  private val FixtureSid = "a0a1a2a3-a4a5-a6a7-a8a9-aaabacadaeaf"

  /** c17's decoded snapshot of the COMPRESSED corpus — DuckDB
    * re-aggregates the replayed events. */
  private val CompressedSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_zstdevents_cur"

  /** Transaction-compressed binary binlog, written the way a MySQL
    * 8.0.20+ server with `binlog_transaction_compression=ON` and
    * `binlog_rows_query_log_events=ON` writes it: every committed
    * transaction is one Transaction_payload_event — file 1 ZSTD, file
    * 2 the algorithm-NONE variant (the server's fallback when
    * compression would not shrink) — with the original statements
    * logged as type-29 ROWS_QUERY events INSIDE the payloads.
    * SF-independent: c17 certifies the decompress-and-replay decode,
    * not volume. */
  private def compressedFixturePath(): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_binzstd_v1")
    if (!java.nio.file.Files.isDirectory(p)) {
      val tmp = java.nio.file.Files.createTempDirectory(p.getParent, "graft_binzstd")
      import graft.sources.BinlogBinaryFixture._
      var gno = 0
      for (f <- 0 until 2) {
        val evs = scala.collection.mutable.ArrayBuffer[Ev](PreviousGtids)
        for (t <- 0 until 120) {
          gno += 1
          val i = gno * 3
          evs += Gtid(gno.toLong); evs += Begin
          if (t % 2 == 0)
            evs += RowsQuery(s"insert into t_pk /* original stmt $i */ values ($i)")
          (t % 3: @unchecked) match {
            case 0 => evs += Insert(i, s"z_$i", Some(i % 50 + 0.5))
            case 1 => evs += Update((i, s"z_$i", Some(1.5)),
              (i, s"z2_$i", Some(2.5)))
            case 2 => evs += Delete(i, s"z_$i", None)
          }
          // a second statement in the same txn: its rows carry NO
          // rows_query (the scope ended at the first STMT_END_F)
          if (t % 5 == 0) evs += Insert(i + 1, s"h_$i", None)
          evs += Xid(2000L + gno)
        }
        evs += (if (f == 0) Rotate("binlog.000002") else Stop)
        val (bytes, _) = render(evs.toSeq)
        val framed = compressTransactions(bytes, zstd = f == 0)
        java.nio.file.Files.write(tmp.resolve(f"binlog.${f + 1}%06d"), framed)
      }
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    p.toString
  }

  /** c18's decoded snapshot of the PARTIAL-JSON corpus — DuckDB
    * re-derives the partial-vs-full equivalence join from it. */
  private val PartialSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_cdc_partialevents_cur"

  /** Partial-JSON binary binlog pair (MySQL 8.0
    * `binlog_row_value_options=PARTIAL_JSON`): file 1 logs 80 updates
    * as PARTIAL_UPDATE_ROWS_EVENTs (type 39) whose JSON column ships
    * only (op, path, value) diffs; file 2 logs the SAME logical
    * changes as plain full-image updates. Four diff variants rotate
    * through REPLACE/INSERT/REMOVE over nested members and array
    * elements (incl. append-past-end). SF-independent: c18 certifies
    * the diff application, not volume. */
  private def partialFixturePath(): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_binpartial_v1")
    if (!java.nio.file.Files.isDirectory(p)) {
      val tmp = java.nio.file.Files.createTempDirectory(p.getParent, "graft_binpartial")
      import graft.sources.BinlogBinaryFixture._
      def doc(i: Int): J = JObj(Seq(
        "id" -> JInt(i.toLong),
        "tags" -> JArr(Seq(JStr(s"t$i"), JInt((i % 7).toLong),
          JBool(i % 2 == 0))),
        "meta" -> JObj(Seq("ver" -> JInt(1), "src" -> JStr(s"s${i % 5}")))))
      def variant(i: Int): (Seq[(Int, String, Option[J])], J) = (i % 4) match {
        case 0 => // REPLACE a nested member
          (Seq((0, "$.meta.ver", Some(JInt(i + 100L)))),
            JObj(Seq("id" -> JInt(i.toLong),
              "tags" -> JArr(Seq(JStr(s"t$i"), JInt((i % 7).toLong),
                JBool(i % 2 == 0))),
              "meta" -> JObj(Seq("ver" -> JInt(i + 100L),
                "src" -> JStr(s"s${i % 5}"))))))
        case 1 => // INSERT a member + REMOVE an array element
          (Seq((1, "$.meta.flag", Some(JBool(true))), (2, "$.tags[0]", None)),
            JObj(Seq("id" -> JInt(i.toLong),
              "tags" -> JArr(Seq(JInt((i % 7).toLong), JBool(i % 2 == 0))),
              "meta" -> JObj(Seq("ver" -> JInt(1), "src" -> JStr(s"s${i % 5}"),
                "flag" -> JBool(true))))))
        case 2 => // REPLACE an element + append past the end
          (Seq((0, "$.tags[1]", Some(JStr("r"))),
            (1, "$.tags[99]", Some(JInt(5)))),
            JObj(Seq("id" -> JInt(i.toLong),
              "tags" -> JArr(Seq(JStr(s"t$i"), JStr("r"), JBool(i % 2 == 0),
                JInt(5))),
              "meta" -> JObj(Seq("ver" -> JInt(1),
                "src" -> JStr(s"s${i % 5}"))))))
        case _ => // REMOVE a member + REPLACE a whole subtree
          (Seq((2, "$.meta.src", None), (0, "$.tags", Some(JArr(Seq())))),
            JObj(Seq("id" -> JInt(i.toLong), "tags" -> JArr(Seq()),
              "meta" -> JObj(Seq("ver" -> JInt(1))))))
      }
      def rows(i: Int): (WideRow, Seq[(Int, String, Option[J])], WideRow) = {
        val (diffs, after) = variant(i)
        (WideRow(i, ch = Some(s"c$i"), js = Some(doc(i))), diffs,
          WideRow(i, ch = Some(s"c${i}x"), js = Some(after)))
      }
      val partialEvs = scala.collection.mutable.ArrayBuffer[Ev](PreviousGtids)
      val fullEvs = scala.collection.mutable.ArrayBuffer[Ev](PreviousGtids)
      for (i <- 0 until 80) {
        val (before, diffs, after) = rows(i)
        partialEvs += Gtid(i + 1L); partialEvs += Begin
        partialEvs += WidePartialUpdate(before, diffs, after)
        partialEvs += Xid(500L + i)
        fullEvs += Gtid(i + 1L); fullEvs += Begin
        fullEvs += WideUpdate(before, after)
        fullEvs += Xid(500L + i)
      }
      partialEvs += Rotate("binlog.000002"); fullEvs += Stop
      java.nio.file.Files.write(tmp.resolve("binlog.000001"),
        render(partialEvs.toSeq)._1)
      java.nio.file.Files.write(tmp.resolve("binlog.000002"),
        render(fullEvs.toSeq)._1)
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    p.toString
  }

  /** Rotated GTID-framed binary binlog: every transaction carries
    * GTID/BEGIN/XID framing, gnos run 1..300 CONTINUOUSLY ACROSS the
    * file rotation (the boundary sits mid-interval for c13's filter),
    * and every 4th transaction is multi-row so one GTID covers
    * several change events. SF-independent: c13 certifies filter
    * semantics, not volume. */
  private def gtidFixturePath(): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_bingtid_v1")
    if (!java.nio.file.Files.isDirectory(p)) {
      val tmp = java.nio.file.Files.createTempDirectory(p.getParent, "graft_bingtid")
      import graft.sources.BinlogBinaryFixture._
      var gno = 0
      for (f <- 0 until 2) {
        val evs = scala.collection.mutable.ArrayBuffer[Ev](PreviousGtids)
        for (t <- 0 until 150) {
          gno += 1
          val i = gno * 3
          evs += Gtid(gno.toLong); evs += Begin
          (t % 3: @unchecked) match {
            case 0 => evs += Insert(i, s"g_$i", Some(i % 50 + 0.5))
            case 1 => evs += Update((i, s"g_$i", Some(1.5)),
              (i, s"g2_$i", Some(2.5)))
            case 2 => evs += Delete(i, s"g_$i", None)
          }
          if (t % 4 == 0) evs += Insert(i + 1, s"h_$i", None)
          evs += Xid(1000L + gno)
        }
        evs += (if (f == 0) Rotate("binlog.000002") else Stop)
        val (bytes, _) = render(evs.toSeq)
        java.nio.file.Files.write(tmp.resolve(f"binlog.${f + 1}%06d"), bytes)
      }
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    p.toString
  }

  /** Binary binlog whose t_wide rows carry JSON documents (users,
    * tag arrays, numeric/bool fields, empty arrays, JSON nulls, NULL
    * columns) — deterministic, SF-independent: c12 certifies the
    * JSON decode + extraction semantics, not volume. */
  private def wideJsonFixturePath(): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_binwide_v2")
    if (!java.nio.file.Files.isDirectory(p)) {
      val tmp = java.nio.file.Files.createTempDirectory(p.getParent, "graft_binwide")
      import graft.sources.BinlogBinaryFixture._
      def doc(k: Int): J = JObj(Seq(
        "user" -> JObj(Seq("id" -> JInt(k.toLong), "name" -> JStr(s"user_$k"))),
        "tags" -> (if (k % 5 == 0) JArr(Seq())
          else JArr(Seq(JStr(s"tag${k % 7}"), JStr("common")))),
        "score" -> JDbl((k % 40) / 4.0 + 0.25),
        "active" -> JBool(k % 3 == 0),
        // opaque (0x0F) values — DATE/TIME/DATETIME/DECIMAL stored in
        // documents (r11): every row carries all four so c12 pins
        // their rendered literals via extraction on both engines
        "born" -> JDate(1970 + k % 55, 1 + k % 12, 1 + k % 28),
        "at" -> JDateTime(2020 + k % 6, 1 + k % 12, 1 + k % 28,
          k % 24, k % 60, (k * 7) % 60, (k * 997) % 1000000),
        "t" -> JTime(k % 9 == 3, k % 120, k % 60, (k * 3) % 60,
          (k * 1009) % 1000000),
        "price" -> JDecimal(BigDecimal(k * 25, 2) - 500, 12, 2))
        ++ (if (k % 7 == 2)
          Seq("blob" -> JOpaque(15, Array.tabulate[Byte](k % 9)(b =>
            ((k * 31 + b * 7) & 0xFF).toByte))) else Seq())
        ++ (if (k % 11 == 0) Seq("extra" -> JNull) else Seq()))
      val events: Seq[Ev] = (0 until 400).map { i =>
        val row = WideRow(i, js = if (i % 13 == 0) None else Some(doc(i)))
        i % 4 match {
          case 0 | 1 => WideInsert(row)
          case 2 => WideUpdate(WideRow(i, js = Some(doc(i + 5000))), row)
          case _ => WideDelete(row)
        }
      }
      val (bytes, _) = render(events)
      java.nio.file.Files.write(tmp.resolve("binlog.000001"), bytes)
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    p.toString
  }

  private[queries] def deleteRecursively(path: String): Unit = {
    val root = new java.io.File(path)
    if (root.exists()) {
      Option(root.listFiles()).getOrElse(Array.empty)
        .foreach(f => deleteRecursively(f.getAbsolutePath))
      root.delete(): Unit
    }
  }

  /** Value of image ordinal `ord` in a (ords, vals) parallel-array
    * column pair, null when the image lacks that ordinal (absent side
    * of an insert/delete, short rows). */
  private def imgVal(ords: String, vals: String, ord: Int) = {
    val p = array_position(col(ords), lit(ord))
    when(p > 0, element_at(col(vals), p.cast("int")))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("c1_parse_counts",
      s"""SELECT db, "table", op, COUNT(*) AS c
         |FROM read_parquet('$OracleSnapshot/*.parquet')
         |GROUP BY db, "table", op ORDER BY db, "table", op""".stripMargin) { (s, d) =>
      parsedWithSnapshot(s, d)
        .groupBy("db", "table", "op")
        .agg(count(lit(1)).as("c"))
        .orderBy("db", "table", "op")
    },

    // C5 filter matrix: each engine CdcConfig filter re-expressed as a
    // DuckDB WHERE clause over the same event snapshot — checks
    // db/table/type membership, position bounds (start inclusive /
    // stop exclusive on the event START) and datetime bounds
    // (null-ts passes) against an independent evaluator.
    QueryDef("c5_filter_counts",
      s"""WITH ev AS (SELECT * FROM read_parquet('$OracleSnapshot/*.parquet')),
         |dml AS (SELECT * FROM ev WHERE op IN ('insert','update','delete'))
         |SELECT f, c FROM (
         |  SELECT 'all_types' AS f, COUNT(*) AS c FROM dml
         |  UNION ALL SELECT 'db_hit', COUNT(*) FROM dml WHERE db='testdb'
         |  UNION ALL SELECT 'db_miss', COUNT(*) FROM dml WHERE db='otherdb'
         |  UNION ALL SELECT 'table_hit', COUNT(*) FROM dml WHERE "table" IN ('t_pk')
         |  UNION ALL SELECT 'insert_only', COUNT(*) FROM dml WHERE op IN ('insert')
         |  UNION ALL SELECT 'pos_window', COUNT(*) FROM dml
         |    WHERE start_pos >= 460 AND start_pos < 1300
         |  UNION ALL SELECT 'dt_window', COUNT(*) FROM dml
         |    WHERE (ts IS NULL OR ts >= TIMESTAMP '2026-08-12 05:10:00')
         |      AND (ts IS NULL OR ts < TIMESTAMP '2026-08-12 05:30:00')
         |  UNION ALL SELECT 'combined', COUNT(*) FROM dml
         |    WHERE db='testdb' AND "table" IN ('t_pk') AND op IN ('update','delete')
         |      AND start_pos >= 220
         |      AND (ts IS NULL OR ts >= TIMESTAMP '2026-08-12 05:05:00')
         |) t ORDER BY f""".stripMargin) { (s, d) =>
      // c5's capability is the FILTERS (c1 owns the parse): ensure the
      // engine's parse snapshot exists, then filter the snapshot —
      // re-parsing the whole fixture per filter pass would just
      // re-measure c1. Cache the scalar projection once for the 8
      // branches (Bench's per-query clearCache reclaims).
      parsedWithSnapshot(s, d)
      val events = s.read.parquet(OracleSnapshot)
        .select("op", "db", "table", "start_pos", "ts").cache()
      val cases: Seq[(String, CdcConfig)] = Seq(
        "all_types" -> CdcConfig(),
        "db_hit" -> CdcConfig(database = "testdb"),
        "db_miss" -> CdcConfig(database = "otherdb"),
        "table_hit" -> CdcConfig(tables = Seq("t_pk")),
        "insert_only" -> CdcConfig(sqlTypes = Seq("insert")),
        "pos_window" -> CdcConfig(startPos = Some(460L), stopPos = Some(1300L)),
        "dt_window" -> CdcConfig(startDatetime = Some("2026-08-12 05:10:00"),
          stopDatetime = Some("2026-08-12 05:30:00")),
        "combined" -> CdcConfig(sqlTypes = Seq("update", "delete"),
          database = "testdb", tables = Seq("t_pk"), startPos = Some(220L),
          startDatetime = Some("2026-08-12 05:05:00")))
      cases.map { case (name, cfg) =>
        CdcJob.applyFilters(events, cfg)
          .agg(count(lit(1)).as("c")).select(lit(name).as("f"), col("c"))
      }.reduce(_.unionByName(_)).orderBy("f")
    },

    // The BINARY-source twin of c1: decode format-v4 bytes (no
    // mysqlbinlog dependency), snapshot, and let DuckDB re-aggregate.
    QueryDef("c7_binary_parse_counts",
      s"""SELECT db, "table", op, COUNT(*) AS c
         |FROM read_parquet('$BinOracleSnapshot/*.parquet')
         |GROUP BY db, "table", op ORDER BY db, "table", op""".stripMargin) { (s, d) =>
      val events = graft.sources.BinlogBinary.parse(s, binFixturePath(d))
      writeSnapshotIfStale(BinOracleSnapshot, d) {
        events.select("file", "seq", "start_pos", "stop_pos", "ts", "db", "table", "op")
          .write.mode("overwrite").parquet(BinOracleSnapshot)
      }
      events.groupBy("db", "table", "op")
        .agg(count(lit(1)).as("c"))
        .orderBy("db", "table", "op")
    },

    // c12: JSON columns through the WHOLE binary path — MYSQL_TYPE_JSON
    // documents decoded from binlog bytes to text, recovered from the
    // after-images, and field-extracted with Spark's codegen'd
    // get_json_object; DuckDB independently re-extracts the same paths
    // from the recovered JSON text with ITS json extension, so the
    // binary JSON codec, the literal quoting, and the path semantics
    // (nested fields, array index on possibly-empty arrays, bool/num
    // tokens, NULL columns) are all cross-engine certified. Scale
    // shape: pure map-side — per-file decode tasks, no shuffle before
    // the output sort.
    QueryDef("c12_json_extract",
      s"""SELECT CAST(id AS BIGINT) AS id,
         |  json_extract_string(json, '$$.user.id') AS uid,
         |  json_extract_string(json, '$$.user.name') AS uname,
         |  json_extract_string(json, '$$.tags[0]') AS tag0,
         |  json_extract_string(json, '$$.score') AS score,
         |  json_extract_string(json, '$$.active') AS active,
         |  json_extract_string(json, '$$.born') AS born,
         |  json_extract_string(json, '$$.at') AS at_ts,
         |  json_extract_string(json, '$$.t') AS t_tm,
         |  CAST(json_extract_string(json, '$$.price') AS DOUBLE) AS price,
         |  json_extract_string(json, '$$.blob') AS blob64
         |FROM read_parquet('$JsonOracleSnapshot/*.parquet')
         |ORDER BY id""".stripMargin) { (s, d) =>
      val events = graft.sources.BinlogBinary.parse(s, wideJsonFixturePath())
      // after-image ordinals: 1 = id, 13 = the JSON column; deletes
      // have no after image and drop out with the null id. The decoded
      // literal is '<json>' (no escapes by fixture construction) or
      // the bare NULL — strip the quotes back to raw JSON text.
      val flat = events.filter(col("table") === "t_wide")
        .select(
          imgVal("afterOrds", "afterVals", 1).cast("long").as("id"),
          imgVal("afterOrds", "afterVals", 13).as("js_lit"))
        .filter(col("id").isNotNull)
        .select(col("id"),
          when(col("js_lit") === "NULL", lit(null).cast("string"))
            // the quote-strip below is only sound while the decoded
            // literal carries no my_b_write_quoted \xNN escapes — an
            // invariant of the fixture alphabet. Fail loudly if a
            // future fixture violates it, instead of extracting from
            // corrupted JSON (ADVICE r10).
            .when(col("js_lit").contains("\\x"),
              raise_error(concat(lit("c12: js_lit carries a \\x escape, "
                + "quote-strip would corrupt the JSON: "), col("js_lit")))
                .cast("string"))
            .otherwise(expr("substring(js_lit, 2, length(js_lit) - 2)"))
            .as("json"))
      writeSnapshotIfStale(JsonOracleSnapshot, d) {
        flat.write.mode("overwrite").parquet(JsonOracleSnapshot)
      }
      flat.select(col("id"),
        get_json_object(col("json"), "$.user.id").as("uid"),
        get_json_object(col("json"), "$.user.name").as("uname"),
        get_json_object(col("json"), "$.tags[0]").as("tag0"),
        get_json_object(col("json"), "$.score").as("score"),
        get_json_object(col("json"), "$.active").as("active"),
        // opaque (0x0F) values (r11): temporals extract as their
        // quoted Json_dom literals; decimal compares as DOUBLE (both
        // engines' extractors normalize trailing zeros differently —
        // the decimal LITERAL itself is pinned byte-for-byte by the
        // text-twin parity fixture and the wide-column fuzz)
        get_json_object(col("json"), "$.born").as("born"),
        get_json_object(col("json"), "$.at").as("at_ts"),
        get_json_object(col("json"), "$.t").as("t_tm"),
        get_json_object(col("json"), "$.price").cast("double").as("price"),
        get_json_object(col("json"), "$.blob").as("blob64"))
        .orderBy("id")
    },

    // c13: GTID-interval filters (r11, VERDICT r10 task 4) — the
    // engine decodes the GTID framing events (binary GTID_LOG_EVENT /
    // the text twin's GTID_NEXT line), annotates every change event
    // with its transaction's uuid:gno, and `--include-gtids`-filters
    // through the REAL applyFilters path (a codegen'd interval
    // disjunction). The include set's middle interval spans the file
    // rotation (gnos run continuously across binlog.000001→2), and
    // multi-row transactions share one GTID. DuckDB re-applies the
    // same intervals to the unfiltered gtid-annotated snapshot.
    // Scale shape: a scan-pushed predicate, one bounded group-by.
    QueryDef("c13_gtid_filter",
      s"""SELECT gtid, op, CAST(COUNT(*) AS BIGINT) AS n
         |FROM read_parquet('$GtidSnapshot/*.parquet')
         |WHERE split_part(gtid, ':', 1) = '$FixtureSid'
         |  AND (CAST(split_part(gtid, ':', 2) AS BIGINT) BETWEEN 40 AND 260
         |    OR CAST(split_part(gtid, ':', 2) AS BIGINT) BETWEEN 290 AND 295)
         |GROUP BY gtid, op ORDER BY gtid, op""".stripMargin) { (s, d) =>
      val events = graft.sources.BinlogBinary.parse(s, gtidFixturePath())
      writeSnapshotIfStale(GtidSnapshot, d) {
        events.select("file", "seq", "gtid", "db", "table", "op")
          .write.mode("overwrite").parquet(GtidSnapshot)
      }
      CdcJob.applyFilters(events,
        CdcConfig(includeGtids = Some(s"$FixtureSid:40-260:290-295")))
        .groupBy("gtid", "op").agg(count(lit(1)).as("n"))
        .orderBy("gtid", "op")
    },

    // c17: MySQL 8.0.20+ binlog TRANSACTION COMPRESSION (r13, VERDICT
    // r12 items 3+4) — the corpus frames every committed transaction
    // as one Transaction_payload_event (file 1 ZSTD, file 2 the
    // algorithm-NONE fallback) with ROWS_QUERY statements inside the
    // payloads. The reference only survives this because `mysqlbinlog`
    // decompresses before text output (main.py:90); the engine's
    // binary decoder decompresses and replays IN-EXECUTOR (per-file
    // tasks, zero extra shuffle) and surfaces the original statements
    // on the decoded events. DuckDB re-aggregates the replayed
    // snapshot: per-op event counts, how many carried a rows_query,
    // and the distinct transaction (gtid) count — wrong TLV parsing,
    // a mis-sliced payload, or a leaked/lost ROWS_QUERY scope all
    // shift at least one of those numbers.
    QueryDef("c17_compressed_payload",
      s"""SELECT op, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(query) AS BIGINT) AS with_query,
         |  CAST(COUNT(DISTINCT gtid) AS BIGINT) AS txns
         |FROM read_parquet('$CompressedSnapshot/*.parquet')
         |GROUP BY op ORDER BY op""".stripMargin) { (s, d) =>
      val events = graft.sources.BinlogBinary.parse(s, compressedFixturePath())
      writeSnapshotIfStale(CompressedSnapshot, d) {
        events.select("file", "seq", "start_pos", "db", "table", "op",
          "gtid", "query")
          .write.mode("overwrite").parquet(CompressedSnapshot)
      }
      events.groupBy("op").agg(
        count(lit(1)).as("n"),
        count(col("query")).as("with_query"),
        countDistinct(col("gtid")).as("txns"))
        .orderBy("op")
    },

    // c18: PARTIAL JSON updates (r13) — MySQL 8.0's
    // binlog_row_value_options=PARTIAL_JSON logs UPDATEs to JSON
    // columns as (op, path, value) diff sequences
    // (PARTIAL_UPDATE_ROWS_EVENT, sql/json_diff.h); the binary decoder
    // APPLIES them against the before image so every downstream
    // consumer sees complete row images. The corpus pairs a partial
    // file with its full-image twin logging the SAME logical changes;
    // the entry joins them per seq and certifies the applied after
    // images EQUAL the full ones — and DuckDB re-derives the identical
    // join (list equality included) from the decoded snapshot, so a
    // drifting diff applier breaks the hash on both the equality
    // column and the exposed applied document text.
    QueryDef("c18_partial_json",
      s"""WITH p AS (SELECT seq, "afterVals" av FROM read_parquet('$PartialSnapshot/*.parquet')
         |           WHERE file LIKE '%000001'),
         |f AS (SELECT seq, "afterVals" av FROM read_parquet('$PartialSnapshot/*.parquet')
         |      WHERE file LIKE '%000002')
         |SELECT CAST(p.seq AS BIGINT) AS seq,
         |       (p.av = f.av) AS applied_equal,
         |       p.av[13] AS applied_js
         |FROM p JOIN f ON p.seq = f.seq ORDER BY seq""".stripMargin) { (s, d) =>
      val events = graft.sources.BinlogBinary.parse(s, partialFixturePath())
      writeSnapshotIfStale(PartialSnapshot, d) {
        events.select("file", "seq", "op", "afterVals")
          .write.mode("overwrite").parquet(PartialSnapshot)
      }
      val p = events.filter(col("file").endsWith("000001"))
        .select(col("seq"), col("afterVals").as("pv"))
      val f = events.filter(col("file").endsWith("000002"))
        .select(col("seq"), col("afterVals").as("fv"))
      p.join(f, Seq("seq"))
        .select(col("seq"),
          (col("pv") === col("fv")).as("applied_equal"),
          element_at(col("pv"), 13).as("applied_js"))
        .orderedSmall(col("seq"))
    },

    QueryDef.noOracle("c2_forward_sql") { (s, d) =>
      CdcJob.run(s, fixturePath(d), Catalog.fixture(s), CdcConfig())
    },

    QueryDef.noOracle("c3_flashback_sql") { (s, d) =>
      CdcJob.run(s, fixturePath(d), Catalog.fixture(s),
        CdcConfig(flashback = true))
    },

    QueryDef.noOracle("c6_ddl_passthrough") { (s, d) =>
      val p = BinlogFixture.materialize("repr", BinlogFixture.representative)
      CdcJob.run(s, p, Catalog.fixture(s), CdcConfig(includeDdl = true))
    },

    // c8: the adversarial corpus (BinlogFixture.stressStream — multi-db
    // multi-table interleaving, NULL-heavy and PK-changing images,
    // 3-row multi-row events, `=` in literals, mixed DDL) through the
    // full parse incl. DDL, parse-count oracle like c1: the snapshot's
    // scalar columns let DuckDB independently re-aggregate counts by
    // (db, table, op); CdcStressSpec additionally asserts those counts
    // equal the generator's composition derived WITHOUT text.
    QueryDef("c8_stress_parse_counts",
      s"""SELECT db, "table", op, COUNT(*) AS c
         |FROM read_parquet('$StressOracleSnapshot/*.parquet')
         |GROUP BY db, "table", op ORDER BY db, "table", op""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      val events = CdcJob.parse(s, p, includeDdl = true)
      writeSnapshotIfStale(StressOracleSnapshot, d) {
        events.select("file", "seq", "start_pos", "stop_pos", "ts", "db", "table", "op")
          .write.mode("overwrite").parquet(StressOracleSnapshot)
      }
      events.groupBy("db", "table", "op")
        .agg(count(lit(1)).as("c"))
        .orderBy("db", "table", "op")
    },

    // c9: CDC log → table-state materialization (the compaction every
    // log-consuming lakehouse runs: Delta/Hudi merge-on-read, "state
    // as of the log's end"). Row-image semantics, last-writer-wins per
    // (db, table, key): an insert/update upserts its AFTER image, a
    // delete tombstones its BEFORE key, and a PK-CHANGING update (the
    // stress fixture has them) is exactly one tombstone for the old
    // key plus one upsert for the new — both emitted from the same
    // event, ordered by (file, seq, action-rank) so the upsert wins
    // over its own tombstone when the key does not move. Scale shape:
    // ONE pass over the log (the two actions explode inside the scan
    // stage), then a single hash exchange on the key where `max_by`
    // argmax partial-aggregates MAP-SIDE — the classic window
    // row_number=1 formulation (the oracle's) would instead sort
    // whole partitions; at 100 TB of log the map-side combine is the
    // difference between shuffling per-key maxima and shuffling every
    // event. Values stay verbatim literal strings (the reference's
    // lossless carry, model.scala); only the key casts to BIGINT for
    // a stable output order.
    QueryDef("c9_state_materialize",
      s"""WITH snap AS (SELECT * FROM read_parquet('$StateOracleSnapshot/*.parquet')),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM snap WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM snap WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |           ORDER BY file DESC, seq DESC, rnk DESC) AS rn FROM acts)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, c2, c3
         |FROM last WHERE rn = 1 AND keep = 1
         |ORDER BY db, "table", id""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      val flat = flattenImages(CdcJob.parse(s, p))
      writeSnapshotIfStale(StateOracleSnapshot, d) {
        flat.write.mode("overwrite").parquet(StateOracleSnapshot)
      }
      materializeFromFlat(flat)
        .orderedRows(col("db"), col("table"), col("id"))
    },

    // c10: the STREAMING form of c9 — incremental state maintenance
    // over the binlog drop-directory stream, one micro-batch per
    // rotated file (maxFilesPerTrigger=1), folding each batch into
    // the stamped state via [[mergeState]] inside foreachBatch (state
    // localCheckpoint'ed per merge: bounded lineage, table-sized
    // data). SAME ORACLE AS c9: the streamed-incremental fold must
    // hash-match DuckDB's answer over the full log — a streaming
    // entry certified by a SQL oracle, not just a golden. The merge's
    // commutativity (stamps + argmax) is spec'd by reverse-order
    // folding.
    QueryDef("c10_state_stream",
      s"""WITH snap AS (SELECT * FROM read_parquet('$StateOracleSnapshot/*.parquet')),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM snap WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM snap WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |           ORDER BY file DESC, seq DESC, rnk DESC) AS rn FROM acts)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, c2, c3
         |FROM last WHERE rn = 1 AND keep = 1
         |ORDER BY db, "table", id""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      // ensure the shared snapshot exists whichever of c9/c10 runs first
      writeSnapshotIfStale(StateOracleSnapshot, d) {
        flattenImages(CdcJob.parse(s, p))
          .write.mode("overwrite").parquet(StateOracleSnapshot)
      }
      var state: Option[DataFrame] = None
      val checkpoint = java.nio.file.Files
        .createTempDirectory("graft_c10_cp").toString
      val q = graft.streaming.CdcStream.events(s, p, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          state = Some(
            mergeState(state, flattenImages(batch)).localCheckpoint())
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      stateView(state.get).orderedRows(col("db"), col("table"), col("id"))
    },

    // c23: the APPLY SINK (r15 — the gap the reference's whole purpose
    // points at): the binlog stream's changes applied EXACTLY ONCE to
    // a LIVE JDBC target (embedded Derby) via the staged, epoch-fenced
    // transactional merge (doc at [[CdcApply]]), then the state read
    // BACK from the target over JDBC. SAME ORACLE AS c9: what the
    // target database holds after the fenced replay must hash-match
    // DuckDB's materialization of the full log — parse → apply →
    // read-back, certified end-to-end. Fence/commute/idempotence
    // properties are spec-pinned (CdcApplySpec: replayed epoch
    // skipped, reverse-order application converges).
    QueryDef("c23_cdc_apply",
      s"""WITH snap AS (SELECT * FROM read_parquet('$StateOracleSnapshot/*.parquet')),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM snap WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM snap WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |           ORDER BY file DESC, seq DESC, rnk DESC) AS rn FROM acts)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, c2, c3
         |FROM last WHERE rn = 1 AND keep = 1
         |ORDER BY db, "table", id""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      // ensure the shared snapshot exists whichever of c9/c10/c23 runs
      // first
      writeSnapshotIfStale(StateOracleSnapshot, d) {
        flattenImages(CdcJob.parse(s, p))
          .write.mode("overwrite").parquet(StateOracleSnapshot)
      }
      val url = CdcApply.newTargetUrl()
      val ckpt = graft.TmpDirs.scratch("graft_c23_cp")
      val q = graft.streaming.CdcStream.events(s, p, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          CdcApply.applyBatch(url, "c23", epoch, batch)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      // materialize the read-back (distributed, localCheckpoint) so
      // the per-run in-memory Derby database can be dropped — bench
      // passes mint one each and would otherwise accumulate in heap
      val out = CdcApply.readState(s, url).localCheckpoint(true)
      CdcApply.dropTarget(url)
      out.orderedRows(col("db"), col("table"), col("id"))
    },

    // c24: FLASHBACK APPLY (r15) — the reference's marquee feature
    // (-B, log2sql.py:138-160) realized end-to-end on a LIVE target:
    // after the forward replay, UNDO the last binlog file by applying
    // ONE compensating batch through the same fenced transactional
    // merge — for every key the tail touched, restore the before
    // image of its earliest tail action (or tombstone a key the tail
    // created), stamped ABOVE every log stamp so the correction wins
    // (doc at [[flashbackActions]]). The oracle is INDEPENDENT of the
    // inversion: DuckDB materializes the log TRUNCATED before the
    // flashbacked file (c22's time-travel derivation) — what the live
    // database holds after undo must equal what it would have held
    // had the tail never been applied. Fixture: the SELF-CONSISTENT
    // stream (true before images — what a real row-format binlog
    // records, and the property flashback soundness rests on; the
    // stress fixture fabricates WHERE images for parser adversity,
    // so undo-by-before-image is only equal to truncated replay on a
    // consistent log).
    QueryDef("c24_cdc_flashback_apply",
      s"""WITH snap0 AS (SELECT * FROM read_parquet('$FlashOracleSnapshot/*.parquet')),
         |snap AS (SELECT * FROM snap0 WHERE file < (SELECT MAX(file) FROM snap0)),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM snap WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM snap WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |           ORDER BY file DESC, seq DESC, rnk DESC) AS rn FROM acts)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, c2, c3
         |FROM last WHERE rn = 1 AND keep = 1
         |ORDER BY db, "table", id""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDirParts("consistent_v1",
        BinlogFixture.consistentStreamParts(3000, 2))
      writeSnapshotIfStale(FlashOracleSnapshot, d) {
        flattenImages(CdcJob.parse(s, p))
          .write.mode("overwrite").parquet(FlashOracleSnapshot)
      }
      val events = CdcJob.parse(s, p)
      val flat = flattenImages(events)
      val files = flat.select("file").distinct()
        .collect().map(_.getString(0)).sorted // bounded: file count
      val url = CdcApply.newTargetUrl()
      // forward replay, one fenced batch per binlog file
      files.zipWithIndex.foreach { case (f, i) =>
        CdcApply.applyBatch(url, "c24", i.toLong,
          events.filter(col("file") === f))
      }
      // undo the last file: one compensating batch, stamped above
      // every log stamp ('~' > every fixture file-name byte)
      CdcApply.applyActions(url, "c24", files.length.toLong,
        flashbackActions(flat.filter(col("file") === files.last))
          .withColumn("file", lit("~flashback"))
          .withColumn("seq", lit(0L))
          .withColumn("rnk", lit(0)))
      val out = CdcApply.readState(s, url).localCheckpoint(true)
      CdcApply.dropTarget(url)
      out.orderedRows(col("db"), col("table"), col("id"))
    },

    // c25: EVOLVE APPLY (late r15) — DDL carried THROUGH the apply
    // sink to the live target: c23/c24 replay DML against a fixed
    // schema, but the reference's --include-ddl output exists so a
    // replay carries schema changes too. The evolve fixture's ALTERs
    // execute against the live Derby target INSIDE the same fenced
    // transaction as the batch's DML merge (Derby DDL is
    // transactional), each row event resolves its column names
    // against the positioned schema version at ITS log position
    // (c15's decode applied to the sink side, name resolution
    // distributed via a broadcast version table), and rows that
    // predate an ALTER leave the later columns NULL — exactly what
    // the target would hold had every statement been applied at its
    // own time. Read-back UNPIVOTS the evolved table to a stable
    // (id, colname, value) shape. The oracle re-derives that state
    // INDEPENDENTLY from the raw positional images: last action per
    // key (c9's argmax), each surviving cell named by which ALTER
    // introduced its ordinal strictly before the event — so one
    // mis-versioned, mis-merged, or un-ALTERed cell anywhere breaks
    // the hash. Doc at [[CdcApply.applyEvolvedBatch]].
    QueryDef("c25_evolve_apply", EvolveApplyOracleSql) { (s, d) =>
      val p = BinlogFixture.materializeDirParts("evolve_stream_v1",
        BinlogFixture.evolveStreamParts(700, 4))
      val events = CdcJob.parse(s, p, includeDdl = true)
      writeSnapshotIfStale(EvolveApplySnapshot, d) {
        events.select("file", "seq", "db", "table", "op", "ddl",
          "beforeOrds", "beforeVals", "afterOrds", "afterVals")
          .write.mode("overwrite").parquet(EvolveApplySnapshot)
      }
      val files = events.select("file").distinct()
        .collect().map(_.getString(0)).sorted // bounded: file count
      val url = CdcApply.newTargetUrl()
      var ddls: Seq[(String, Long, String, String)] = Nil
      files.zipWithIndex.foreach { case (f, i) =>
        ddls = CdcApply.applyEvolvedBatch(url, "c25", i.toLong,
          events.filter(col("file") === f), "appdb", "evolve",
          IndexedSeq("id", "a"), ddls)
      }
      val out = CdcApply.readEvolvedState(s, url, "appdb", "evolve")
        .localCheckpoint(true)
      CdcApply.dropTarget(url)
      out.orderedRows(col("id"), col("colname"))
    },

    // c26: the STREAMING form of c25 (the c9→c10 pattern applied to
    // the evolve-apply loop): a long-running tail of the rotating
    // binlog directory, one micro-batch per file, each batch's DDL
    // and DML applied to the live target through the SAME fenced
    // kernel — the accumulated-DDL driver state (c19's bounded
    // contract) carries the schema history across micro-batches, so
    // a column added in batch N versions the decode and the target
    // ALTER for every later batch. SAME ORACLE AS c25: what the live
    // database holds after the streamed replay must hash-match
    // DuckDB's independent materialization of the full evolved log.
    QueryDef("c26_evolve_apply_stream", EvolveApplyOracleSql) { (s, d) =>
      val p = BinlogFixture.materializeDirParts("evolve_stream_v1",
        BinlogFixture.evolveStreamParts(700, 4))
      writeSnapshotIfStale(EvolveApplySnapshot, d) {
        CdcJob.parse(s, p, includeDdl = true)
          .select("file", "seq", "db", "table", "op", "ddl",
            "beforeOrds", "beforeVals", "afterOrds", "afterVals")
          .write.mode("overwrite").parquet(EvolveApplySnapshot)
      }
      val url = CdcApply.newTargetUrl()
      var ddls: Seq[(String, Long, String, String)] = Nil
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_c26_cp").toString
      val q = graft.streaming.CdcStream
        .events(s, p, includeDdl = true, maxFilesPerTrigger = 1)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          ddls = CdcApply.applyEvolvedBatch(url, "c26", epoch, batch,
            "appdb", "evolve", IndexedSeq("id", "a"), ddls)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = CdcApply.readEvolvedState(s, url, "appdb", "evolve")
        .localCheckpoint(true)
      CdcApply.dropTarget(url)
      out.orderedRows(col("id"), col("colname"))
    },

    // c20: SCD TYPE-2 DIMENSION HISTORY (r14) — the OTHER standard
    // consumer of a CDC log besides c9's snapshot: a slowly-changing
    // dimension where every key keeps its FULL version history with
    // [valid_from, valid_to) stamps and an is_current marker (the
    // Kimball type-2 table every warehouse builds from change feeds).
    // Version rows are the upserts; each closes at the stamp of the
    // NEXT action on its key — an update's paired tombstone closes the
    // old version at the same (file, seq) the new one opens, so
    // versions tile the key's timeline exactly, and a trailing delete
    // closes the last version without opening one (the key then has
    // no current row). PK-changing updates land naturally: the old
    // key's history closes, the new key's opens. Scale shape: ONE
    // hash exchange on (db, table, id) and one sort-within-partitions
    // feeding BOTH window functions (lead over all actions, version
    // numbers over the upserts — same partitioning/ordering, Catalyst
    // reuses the exchange) — per-key history is embarrassingly
    // key-parallel at any corpus size, never a global sort. Unlike
    // c9's argmax (which map-side combines), history must see every
    // action — shuffling the actions IS the minimum data movement for
    // this output.
    QueryDef("c20_scd2_history",
      s"""WITH snap AS (SELECT * FROM read_parquet('$StateOracleSnapshot/*.parquet')),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM snap WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM snap WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |led AS (SELECT *,
         |          LEAD(file) OVER w AS to_file, LEAD(seq) OVER w AS to_seq
         |        FROM acts
         |        WINDOW w AS (PARTITION BY db, "table", id
         |                     ORDER BY file, seq, rnk)),
         |vers AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |                     ORDER BY file, seq, rnk) AS ver
         |         FROM led WHERE keep = 1)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, CAST(ver AS INT) AS ver,
         |       c2, c3, file AS from_file, seq AS from_seq, to_file, to_seq,
         |       (to_file IS NULL) AS is_current
         |FROM vers ORDER BY db, "table", id, ver""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      val flat = flattenImages(CdcJob.parse(s, p))
      writeSnapshotIfStale(StateOracleSnapshot, d) {
        flat.write.mode("overwrite").parquet(StateOracleSnapshot)
      }
      scd2History(flat)
        .orderedRows(col("db"), col("table"), col("id"), col("ver"))
    },

    // c21: the STREAMING form of c20 — incremental SCD2 maintenance
    // over the binlog drop-directory stream, folding each micro-batch
    // into the bounded open-version state via [[scd2Merge]]: closed
    // version rows emit APPEND-ONLY per batch (a real deployment
    // appends them straight to the dimension table), the state carries
    // one row per LIVE key (PK-domain-bounded, like c10 — never log
    // length), and a version closed in batch k is untouched by batch
    // k+1. SAME ORACLE AS c20: the streamed-incremental history must
    // hash-match DuckDB's answer over the full log.
    QueryDef("c21_scd2_stream",
      s"""WITH snap AS (SELECT * FROM read_parquet('$StateOracleSnapshot/*.parquet')),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM snap WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM snap WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |led AS (SELECT *,
         |          LEAD(file) OVER w AS to_file, LEAD(seq) OVER w AS to_seq
         |        FROM acts
         |        WINDOW w AS (PARTITION BY db, "table", id
         |                     ORDER BY file, seq, rnk)),
         |vers AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |                     ORDER BY file, seq, rnk) AS ver
         |         FROM led WHERE keep = 1)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, CAST(ver AS INT) AS ver,
         |       c2, c3, file AS from_file, seq AS from_seq, to_file, to_seq,
         |       (to_file IS NULL) AS is_current
         |FROM vers ORDER BY db, "table", id, ver""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      writeSnapshotIfStale(StateOracleSnapshot, d) {
        flattenImages(CdcJob.parse(s, p))
          .write.mode("overwrite").parquet(StateOracleSnapshot)
      }
      var state: Option[DataFrame] = None
      var closed: Option[DataFrame] = None
      val checkpoint = java.nio.file.Files
        .createTempDirectory("graft_c21_cp").toString
      val q = graft.streaming.CdcStream.events(s, p, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val (ns, cl) = scd2Merge(state, flattenImages(batch))
          state = Some(ns.localCheckpoint())
          closed = Some(closed.map(_.unionByName(cl)).getOrElse(cl)
            .localCheckpoint())
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      closed.get.unionByName(scd2View(state.get))
        .orderedRows(col("db"), col("table"), col("id"), col("ver"))
    },

    // c22: POINT-IN-TIME READ over the SCD2 history — the payoff of
    // keeping versions at all: reconstruct the table state AS OF any
    // log position by pure predicate (from ≤ P < to), no replay. The
    // cutoff is mid-log (the max file at seq 750 — expressed
    // relatively so the oracle needs no path literals). The oracle is
    // the INDEPENDENT derivation: c9's last-writer argmax over the log
    // TRUNCATED at the same position — time travel via history must
    // equal replay-to-position, key for key. Scale shape: the history
    // scan filters by two comparisons (at real scale, a from/to-sorted
    // or partitioned history table prunes instead of scanning); no
    // joins, no window — the SCD2 build already paid them.
    QueryDef("c22_time_travel",
      s"""WITH snap AS (SELECT * FROM read_parquet('$StateOracleSnapshot/*.parquet')),
         |mx AS (SELECT MAX(file) AS f FROM snap),
         |cut AS (SELECT s.* FROM snap s CROSS JOIN mx
         |        WHERE s.file < mx.f OR (s.file = mx.f AND s.seq <= 750)),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM cut WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM cut WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |           ORDER BY file DESC, seq DESC, rnk DESC) AS rn FROM acts)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, c2, c3
         |FROM last WHERE rn = 1 AND keep = 1
         |ORDER BY db, "table", id""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      val flat = flattenImages(CdcJob.parse(s, p))
      writeSnapshotIfStale(StateOracleSnapshot, d) {
        flat.write.mode("overwrite").parquet(StateOracleSnapshot)
      }
      val mx = flat.agg(max(col("file")).as("mxf"))
      scd2AsOf(scd2History(flat).crossJoin(broadcast(mx)),
        col("mxf"), lit(750L))
        .orderedRows(col("db"), col("table"), col("id"))
    },

    // c11: EXACTLY-ONCE streaming parquet sink — the CDC event LAKE:
    // the binlog stream lands as parquet via foreachBatch with
    // epoch-keyed OVERWRITE directories, the standard idempotent-sink
    // recipe (a replayed micro-batch after failure/restart rewrites
    // its own epoch=N dir instead of appending duplicates; the
    // checkpoint pins the file→epoch assignment). The entry runs the
    // stream to completion against the rotated fixture, then
    // aggregates the SINK READ-BACK — and the oracle is DuckDB
    // reading THE SINK FILES THEMSELVES: the hash certifies the
    // streaming writer's output is complete and cross-engine
    // readable, not just internally consistent. Restart/idempotence
    // semantics (no new epochs on empty restart, incremental files
    // land in new epochs, totals equal batch parse) are spec'd in
    // CdcStreamSpec.
    // The sink directories are epoch=N/p_db=…/p_table=… — the event
    // LAKE layout (CdcMain.writeEventLake's batch twin): per-table
    // consumers prune partitions instead of scanning the whole lake
    // (plan-asserted in CdcStreamSpec), and the oracle's deeper glob
    // proves the partitioned layout stays cross-engine readable (the
    // real db/table columns live inside the files; p_* are the
    // directory keys).
    QueryDef("c11_sink_parquet",
      s"""SELECT db, "table", op, COUNT(*) AS c
         |FROM read_parquet('$SinkPath/*/*/*/*.parquet')
         |GROUP BY db, "table", op ORDER BY db, "table", op""".stripMargin) { (s, d) =>
      val src = fixturePath(d)
      writeSnapshotIfStale(SinkPath, d) {
        deleteRecursively(SinkPath); deleteRecursively(SinkCkpt)
        val q = graft.streaming.CdcStream.events(s, src)
          .writeStream
          .option("checkpointLocation", SinkCkpt)
          .foreachBatch { (batch: DataFrame, epoch: Long) =>
            CdcMain.writeEventLake(batch, s"$SinkPath/epoch=$epoch")
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(SinkPath)
        .groupBy("db", "table", "op")
        .agg(count(lit(1)).as("c"))
        .orderedSmall(col("db"), col("table"), col("op")) // tables×ops: bounded
    },

    // c14: state maintenance FROM THE PARTITIONED LAKE (r11, VERDICT
    // r10 task 9 — closes the loop the r10 partitioning opened): the
    // incremental c10-style fold now CONSUMES the (p_db, p_table)
    // event lake through a streaming parquet read filtered to ONE
    // table, so a per-table consumer replays only its own partition
    // directories — directory pruning, not a whole-lake scan
    // (PartitionFilters on the batch twin are plan-asserted in
    // CdcStreamSpec; the file-stream LOG still lists all lake files,
    // but non-matching files contribute zero-row scans). The oracle
    // reads THE SAME partition glob in DuckDB, re-derives the
    // flattened images from the raw ordinal/value arrays
    // (list_position — the imgVal twin) and the last-writer state by
    // (file, seq, rnk). Scale shape: one keyed shuffle per batch over
    // one table's events; the lake's other tables are never read.
    QueryDef("c14_lake_state",
      s"""WITH snap AS (
         |  SELECT file, seq, op, db, "table",
         |    CASE WHEN list_position(beforeOrds, 1) IS NOT NULL
         |         THEN beforeVals[list_position(beforeOrds, 1)] END AS before_id,
         |    CASE WHEN list_position(afterOrds, 1) IS NOT NULL
         |         THEN afterVals[list_position(afterOrds, 1)] END AS after_id,
         |    CASE WHEN list_position(afterOrds, 2) IS NOT NULL
         |         THEN afterVals[list_position(afterOrds, 2)] END AS after_c2,
         |    CASE WHEN list_position(afterOrds, 3) IS NOT NULL
         |         THEN afterVals[list_position(afterOrds, 3)] END AS after_c3
         |  FROM read_parquet('$StressLakePath/p_db=logdb/p_table=audit/*.parquet')),
         |acts AS (
         |  SELECT file, seq, 0 AS rnk, db, "table", before_id AS id,
         |         NULL AS c2, NULL AS c3, 0 AS keep
         |  FROM snap WHERE before_id IS NOT NULL AND op IN ('update','delete')
         |  UNION ALL
         |  SELECT file, seq, 1, db, "table", after_id, after_c2, after_c3, 1
         |  FROM snap WHERE after_id IS NOT NULL AND op IN ('insert','update')),
         |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY db, "table", id
         |           ORDER BY file DESC, seq DESC, rnk DESC) AS rn FROM acts)
         |SELECT db, "table", CAST(id AS BIGINT) AS id, c2, c3
         |FROM last WHERE rn = 1 AND keep = 1
         |ORDER BY db, "table", id""".stripMargin) { (s, d) =>
      val src = BinlogFixture.materializeDir(
        "stress_v1", 2, 1500, BinlogFixture.stressStream)
      writeSnapshotIfStale(StressLakePath, d) {
        deleteRecursively(StressLakePath)
        CdcMain.writeEventLake(CdcJob.parse(s, src), StressLakePath)
      }
      val lakeSchema = s.read.parquet(StressLakePath).schema
      var state: Option[DataFrame] = None
      val checkpoint = java.nio.file.Files
        .createTempDirectory("graft_c14_cp").toString
      val q = s.readStream.schema(lakeSchema)
        .option("maxFilesPerTrigger", 4)
        .parquet(StressLakePath)
        .filter(col("p_db") === "logdb" && col("p_table") === "audit")
        .drop("p_db", "p_table")
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          state = Some(
            mergeState(state, flattenImages(batch)).localCheckpoint())
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      stateView(state.get).orderedRows(col("db"), col("table"), col("id"))
    },

    // c15: DDL-AWARE SCHEMA EVOLUTION (r12) — the reference resolves
    // every event against the LIVE information_schema "now"
    // (log2sql.py:29-46), so a log spanning an ALTER TABLE decodes one
    // side of it with the wrong column names. The engine versions the
    // catalog BY LOG POSITION (cdc/SchemaEvolve): each ALTER ADD/DROP
    // COLUMN in the log starts a new schema version at its (file, seq)
    // and every row event resolves ordinals against the version in
    // effect at ITS position — decode becomes a pure function of
    // (base catalog, log). The oracle re-derives, from the raw-event
    // snapshot, the exact rendered column list every INSERT must carry:
    // base (id, a) plus every column added by a strictly-earlier ALTER,
    // in ALTER order — so one mis-versioned event anywhere breaks the
    // hash. The non-evolving t_pk interleaves as an isolation control.
    QueryDef("c15_schema_evolution",
      s"""WITH ev AS (SELECT * FROM read_parquet('$EvolveSnapshot/*.parquet')),
         |adds AS (SELECT seq,
         |           regexp_extract(ddl, 'add column ([A-Za-z0-9_]+)', 1) AS c
         |         FROM ev WHERE op = 'ddl' AND ddl LIKE '%add column%'),
         |ins AS (SELECT seq FROM ev
         |        WHERE op = 'insert' AND "table" = 'evolve')
         |SELECT i.seq,
         |  '`id`, `a`' || coalesce(
         |    string_agg(', `' || a.c || '`', '' ORDER BY a.seq), '')
         |    AS col_list
         |FROM ins i LEFT JOIN adds a ON a.seq < i.seq
         |GROUP BY i.seq ORDER BY i.seq""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materialize("evolve_v1",
        BinlogFixture.evolveStream(700))
      val events = CdcJob.parse(s, p, includeDdl = true)
      writeSnapshotIfStale(EvolveSnapshot, d) {
        events.select("file", "seq", "db", "table", "op", "ddl")
          .write.mode("overwrite").parquet(EvolveSnapshot)
      }
      CdcJob.run(s, p, evolveCatalog(s), CdcConfig(evolveSchema = true))
        .filter(col("op") === "insert" && col("sql").contains("`evolve`"))
        .select(col("seq"), regexp_extract(col("sql"),
          "INSERT INTO `appdb`\\.`evolve`\\(([^)]*)\\)", 1).as("col_list"))
        .orderedRows(col("seq"))
    },

    // c16: CHANGE-EVENT JSON ENVELOPES (r12) — the Debezium-style
    // interop format downstream consumers (Kafka sinks, lakehouse
    // ingestion, audit pipelines) expect from a CDC engine: one JSON
    // document per change with op code (c/u/d), source coordinates,
    // and before/after images. Rendering is a pure codegen'd to_json
    // projection (ignoreNullFields=false: a delete's absent after-
    // image must serialize as explicit nulls, not vanish) — zero
    // shuffle before the output order. The oracle re-serializes the
    // SAME flattened images through DuckDB's json_object, so key
    // order, null policy, number rendering, and string escaping are
    // certified cross-engine byte-for-byte.
    QueryDef("c16_json_envelope",
      s"""SELECT file, seq, CAST(json_object(
         |    'op', CASE op WHEN 'insert' THEN 'c'
         |                  WHEN 'update' THEN 'u' ELSE 'd' END,
         |    'source', json_object('file', file, 'seq', seq),
         |    'before', json_object('id', before_id),
         |    'after', json_object('id', after_id, 'c2', after_c2,
         |                         'c3', after_c3)) AS VARCHAR) AS envelope
         |FROM read_parquet('$EnvelopeSnapshot/*.parquet')
         |ORDER BY file, seq""".stripMargin) { (s, d) =>
      val flat = flattenImages(CdcJob.parse(s, fixturePath(d)))
      writeSnapshotIfStale(EnvelopeSnapshot, d) {
        flat.write.mode("overwrite").parquet(EnvelopeSnapshot)
      }
      envelopes(flat)
        .orderedRows(col("file"), col("seq")) // rows scale with the log
    },

    // c19: SCHEMA EVOLUTION ON THE STREAM (r14, VERDICT r13 item 1) —
    // c15's positioned catalog timelines applied where they matter
    // most: a LONG-RUNNING tail of a rotating directory with ALTERs
    // landing mid-stream. The evolve fixture splits across 4 rotated
    // files, so columns added in file N must version the decode of
    // every later file's rows ACROSS micro-batch boundaries
    // (maxFilesPerTrigger=1: one file per batch). The engine holds the
    // DDL accumulator as driver state (bounded: human-issued DDL) and
    // re-folds timelines per batch — foldDdls sorts by (file, seq), so
    // arrival order cannot change the result (commutativity spec'd in
    // CdcStreamSpec, which also pins stream ≡ batch CdcJob.run over
    // the same directory — c15's answer over the full log). The oracle
    // re-derives from the raw snapshot the exact column list every
    // INSERT must carry: base (id, a) plus every column added by a
    // strictly-earlier ALTER in (file, seq) order.
    QueryDef("c19_evolve_stream",
      s"""WITH ev AS (SELECT * FROM read_parquet('$EvolveStreamSnapshot/*.parquet')),
         |adds AS (SELECT file, seq,
         |           regexp_extract(ddl, 'add column ([A-Za-z0-9_]+)', 1) AS c
         |         FROM ev WHERE op = 'ddl' AND ddl LIKE '%add column%'),
         |ins AS (SELECT file, seq FROM ev
         |        WHERE op = 'insert' AND "table" = 'evolve')
         |SELECT i.file, i.seq,
         |  '`id`, `a`' || coalesce(
         |    string_agg(', `' || a.c || '`', '' ORDER BY a.file, a.seq), '')
         |    AS col_list
         |FROM ins i LEFT JOIN adds a
         |  ON a.file < i.file OR (a.file = i.file AND a.seq < i.seq)
         |GROUP BY i.file, i.seq ORDER BY i.file, i.seq""".stripMargin) { (s, d) =>
      val p = BinlogFixture.materializeDirParts("evolve_stream_v1",
        BinlogFixture.evolveStreamParts(700, 4))
      writeSnapshotIfStale(EvolveStreamSnapshot, d) {
        CdcJob.parse(s, p, includeDdl = true)
          .select("file", "seq", "db", "table", "op", "ddl")
          .write.mode("overwrite").parquet(EvolveStreamSnapshot)
      }
      var acc: Option[DataFrame] = None
      val checkpoint = java.nio.file.Files
        .createTempDirectory("graft_c19_cp").toString
      val q = graft.streaming.CdcStream.startEvolved(s, p, evolveCatalog(s),
        CdcConfig(evolveSchema = true), checkpoint, maxFilesPerTrigger = 1) {
        (batch, _) =>
          val rows = batch
            .filter(col("op") === "insert" && col("sql").contains("`evolve`"))
            .select(col("file"), col("seq"), regexp_extract(col("sql"),
              "INSERT INTO `appdb`\\.`evolve`\\(([^)]*)\\)", 1).as("col_list"))
          // localCheckpoint materializes WITHIN the callback (the
          // startEvolved sink contract: the batch unpersists after)
          acc = Some(acc.map(_.unionByName(rows)).getOrElse(rows)
            .localCheckpoint())
      }
      try q.processAllAvailable() finally q.stop()
      acc.get.orderedRows(col("file"), col("seq"))
    }
  )

  /** The c16 envelope projection — STATELESS, so it runs unchanged on
    * the streaming frame (CdcStreamSpec certifies stream ≡ batch). */
  def envelopes(flat: DataFrame): DataFrame =
    flat.select(col("file"), col("seq"),
      to_json(struct(
        when(col("op") === "insert", "c")
          .when(col("op") === "update", "u").otherwise("d").as("op"),
        struct(col("file"), col("seq")).as("source"),
        struct(col("before_id").as("id")).as("before"),
        struct(col("after_id").as("id"), col("after_c2").as("c2"),
          col("after_c3").as("c3")).as("after")),
        Map("ignoreNullFields" -> "false")).as("envelope"))

  /** Base catalog for the c15 fixture: the evolving table's schema AT
    * THE LOG'S START (id PRI, a) plus the non-evolving control. */
  private def evolveCatalog(s: SparkSession): DataFrame = {
    import s.implicits._
    Catalog.resolve(
      Seq(
        ("appdb", "evolve", "id", 1, "PRI"),
        ("appdb", "evolve", "a", 2, ""),
        ("testdb", "t_pk", "id", 1, "PRI"),
        ("testdb", "t_pk", "name", 2, ""),
        ("testdb", "t_pk", "score", 3, ""))
        .toDF("table_schema", "table_name", "column_name",
          "ordinal_position", "column_key"),
      Seq(
        ("appdb", "evolve", "PRIMARY", 0, "id"),
        ("testdb", "t_pk", "PRIMARY", 0, "id"))
        .toDF("table_schema", "table_name", "index_name",
          "non_unique", "column_name"))
  }

  /** c9 stage 1: per-event flattened key/value scalars from the image
    * arrays (key = ordinal 1, the fixture tables' PK; c2/c3 = the
    * remaining columns' AFTER values, verbatim literals). */
  def flattenImages(events: DataFrame): DataFrame =
    events.select(col("file"), col("seq"), col("op"), col("db"), col("table"),
      imgVal("beforeOrds", "beforeVals", 1).as("before_id"),
      imgVal("afterOrds", "afterVals", 1).as("after_id"),
      imgVal("afterOrds", "afterVals", 2).as("after_c2"),
      imgVal("afterOrds", "afterVals", 3).as("after_c3"),
      // r15: before-image VALUES, for the c24 flashback apply (the
      // state to RESTORE is the before side of a key's earliest
      // undone action) — additive columns; every older consumer and
      // oracle selects by name
      imgVal("beforeOrds", "beforeVals", 2).as("before_c2"),
      imgVal("beforeOrds", "beforeVals", 3).as("before_c3"))

  /** Upsert/tombstone actions from a flattened batch, each carrying
    * its (file, seq, rnk) last-writer stamp. */
  private def stampedActions(flat: DataFrame): DataFrame =
    flat.select(col("db"), col("table"),
      explode(array(
        struct(col("before_id").as("id"),
          lit(null).cast("string").as("c2"),
          lit(null).cast("string").as("c3"), lit(0).as("keep"),
          col("file"), col("seq"), lit(0).as("rnk")),
        struct(col("after_id").as("id"), col("after_c2").as("c2"),
          col("after_c3").as("c3"), lit(1).as("keep"),
          col("file"), col("seq"), lit(1).as("rnk")))).as("a"))
      .select(col("db"), col("table"), col("a.*"))
      .filter(col("id").isNotNull)

  /** Argmax per key over stamped action rows → stamped STATE rows
    * (tombstones RETAINED with keep=0: the state must remember a
    * deletion's stamp or a late-arriving older upsert for the same
    * key would resurrect the row — what makes [[mergeState]]
    * order-independent). */
  private def foldState(acts: DataFrame): DataFrame =
    acts.groupBy("db", "table", "id")
      .agg(max_by(
        struct(col("keep"), col("c2"), col("c3"),
          col("file"), col("seq"), col("rnk")),
        struct(col("file"), col("seq"), col("rnk"))).as("m"))
      .select(col("db"), col("table"), col("id"), col("m.*"))

  /** Live rows of a stamped state (the queryable table view). */
  private def liveRows(state: DataFrame): DataFrame =
    state.filter(col("keep") === 1)
      .select(col("db"), col("table"), col("id").cast("long").as("id"),
        col("c2"), col("c3"))

  /** c9 stage 2: last-writer-wins state from the flattened log — see
    * the entry's scaladoc for the action/argmax shape. */
  def materializeFromFlat(flat: DataFrame): DataFrame =
    liveRows(foldState(stampedActions(flat)))

  /** c20: SCD type-2 version history from a flattened log — versions
    * are the upserts, each valid until the stamp of the next action on
    * its key (tombstones close without opening). Both windows share
    * one (db, table, id) partitioning + (file, seq, rnk) ordering, so
    * the plan is one exchange + one sort however large the log. */
  def scd2History(flat: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("db", "table", "id")
      .orderBy("file", "seq", "rnk")
    stampedActions(flat)
      .withColumn("to_file", lead(col("file"), 1).over(w))
      .withColumn("to_seq", lead(col("seq"), 1).over(w))
      .filter(col("keep") === 1)
      .withColumn("ver", row_number().over(w))
      .select(col("db"), col("table"), col("id").cast("long").as("id"),
        col("ver"), col("c2"), col("c3"),
        col("file").as("from_file"), col("seq").as("from_seq"),
        col("to_file"), col("to_seq"),
        col("to_file").isNull.as("is_current"))
  }

  /** c21: INCREMENTAL SCD2 fold — one micro-batch of flattened changes
    * against the bounded OPEN-VERSION state. Returns (newState,
    * closedThisBatch): state holds ONE row per live key (the open
    * version + its ordinal) — bounded by the PK domain like c10's
    * state, never by log length — and closed version rows are emitted
    * APPEND-ONLY, never revisited (a tailing stream's stamps are
    * monotone across rotated files, so a version closed once cannot
    * reopen). Per batch the window runs over open-state rows ∪ batch
    * actions: affected keys + batch rows, not history. Unlike c10's
    * argmax (idempotent under replay), the APPEND of closed rows is
    * what a replayed micro-batch would duplicate — a deployment fences
    * it exactly like c11: closed rows land in epoch-keyed OVERWRITE
    * directories, so a replay rewrites its own epoch. */
  def scd2Merge(state: Option[DataFrame], flat: DataFrame)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val acts = stampedActions(flat)
      .withColumn("ver", lit(null).cast("int"))
    // an open version re-enters the fold as the upsert that opened it
    val combined = state
      .map(o => o.withColumn("keep", lit(1)).withColumn("rnk", lit(1))
        .unionByName(acts))
      .getOrElse(acts)
    val wo = Window.partitionBy("db", "table", "id")
      .orderBy("file", "seq", "rnk")
    val wk = Window.partitionBy("db", "table", "id")
    val vers = combined
      .withColumn("to_file", lead(col("file"), 1).over(wo))
      .withColumn("to_seq", lead(col("seq"), 1).over(wo))
      .filter(col("keep") === 1)
      .withColumn("rn", row_number().over(wo))
      .withColumn("base", max(coalesce(col("ver"), lit(0))).over(wk))
      .withColumn("hasState",
        max(when(col("ver").isNotNull, 1).otherwise(0)).over(wk))
      .withColumn("ver", coalesce(col("ver"),
        col("base") + col("rn") - col("hasState")))
    val closed = vers.filter(col("to_file").isNotNull)
      .select(col("db"), col("table"), col("id").cast("long").as("id"),
        col("ver"), col("c2"), col("c3"),
        col("file").as("from_file"), col("seq").as("from_seq"),
        col("to_file"), col("to_seq"), lit(false).as("is_current"))
    val newState = vers.filter(col("to_file").isNull)
      .select(col("db"), col("table"), col("id"), col("c2"), col("c3"),
        col("file"), col("seq"), col("ver"))
    (newState, closed)
  }

  /** c22: the AS-OF filter over an SCD2 history frame carrying cutoff
    * columns — a version is live at P = (pf, ps) iff its from-stamp ≤ P
    * and its to-stamp (if any) > P. Returns the c9-shaped table state. */
  def scd2AsOf(hist: DataFrame, pf: org.apache.spark.sql.Column,
      ps: org.apache.spark.sql.Column): DataFrame =
    hist
      .filter(col("from_file") < pf ||
        (col("from_file") === pf && col("from_seq") <= ps))
      .filter(col("to_file").isNull || col("to_file") > pf ||
        (col("to_file") === pf && col("to_seq") > ps))
      .select(col("db"), col("table"), col("id"), col("c2"), col("c3"))

  /** The current (open) versions of a [[scd2Merge]] state, in c20's
    * output schema. */
  def scd2View(state: DataFrame): DataFrame =
    state.select(col("db"), col("table"), col("id").cast("long").as("id"),
      col("ver"), col("c2"), col("c3"),
      col("file").as("from_file"), col("seq").as("from_seq"),
      lit(null).cast("string").as("to_file"),
      lit(null).cast("long").as("to_seq"),
      lit(true).as("is_current"))

  /** c10: INCREMENTAL state maintenance — merge a new flattened batch
    * into an existing stamped state: argmax over (state ∪ batch
    * actions). Stamps make the merge COMMUTATIVE and IDEMPOTENT
    * (max_by over a fixed total order), so batches may arrive in any
    * order — spec'd by folding the log's files in reverse. State size
    * is keys, not events: the incremental form processes each day's
    * delta against yesterday's table, never the full log. */
  def mergeState(state: Option[DataFrame], flat: DataFrame): DataFrame = {
    val acts = stampedActions(flat)
    foldState(state.map(_.unionByName(acts)).getOrElse(acts))
  }

  /** The queryable view of [[mergeState]]'s result. */
  def stateView(state: DataFrame): DataFrame = liveRows(state)

  /** One stamped action per (db, table, key) for a single batch —
    * the in-batch last-writer fold the c23 apply sink stages
    * (tombstones retained, as in [[mergeState]]). */
  private[queries] def foldBatchActions(flat: DataFrame): DataFrame =
    foldState(stampedActions(flat))

  /** c24: the COMPENSATING batch that returns a live target to its
    * state from before `tail`'s events were applied — the reference's
    * flashback (-B), expressed as ONE set-based correction instead of
    * statement-by-statement reverse replay. For every key the tail
    * touched: if the key's EARLIEST tail action saw it on the BEFORE
    * side (it existed at tail start), restore that before image; if
    * only ever on an AFTER side first (the tail created it),
    * tombstone it. Within one event the before side precedes the
    * after (rnk 0 < 1), so a PK-move restores the old key and deletes
    * the new one, and a same-key update restores its own before
    * image. One groupBy on the key — batch-sized, like every apply
    * stage. Output schema = [[foldBatchActions]]'s, with the caller
    * supplying the stamp columns (a flashback correction applies
    * LAST, so its stamp must exceed every log stamp). */
  private[queries] def flashbackActions(tail: DataFrame): DataFrame = {
    val sided = tail.select(col("db"), col("table"),
      explode(array(
        struct(col("before_id").as("id"), lit(0).as("side"),
          col("before_c2").as("c2"), col("before_c3").as("c3"),
          col("file"), col("seq"), lit(0).as("rnk")),
        struct(col("after_id").as("id"), lit(1).as("side"),
          lit(null).cast("string").as("c2"),
          lit(null).cast("string").as("c3"),
          col("file"), col("seq"), lit(1).as("rnk")))).as("a"))
      .select(col("db"), col("table"), col("a.*"))
      .filter(col("id").isNotNull)
    sided.groupBy("db", "table", "id")
      .agg(min_by(struct(col("side"), col("c2"), col("c3")),
        struct(col("file"), col("seq"), col("rnk"))).as("m"))
      .select(col("db"), col("table"), col("id"),
        col("m.c2").as("c2"), col("m.c3").as("c3"),
        when(col("m.side") === 0, lit(1)).otherwise(lit(0)).as("keep"))
  }
}
