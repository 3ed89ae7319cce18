package graft.cdc

import scala.collection.mutable

/** Line-at-a-time finite-state machine over `mysqlbinlog
  * --base64-output=decode-rows -vv` text: `Iterator[String] →
  * Iterator[RawChange]`, truly incremental — events are emitted as
  * their closing line is consumed (≤2 per line: a flushed DML row and
  * a terminated DDL), so a task holds the file text but never a
  * materialized event list on top of it. Pure Scala (no Spark);
  * `CdcJob` wraps it in a per-file flatMap.
  *
  * Re-expresses the reference's single pass (/root/reference/
  * log2sql.py:66-108 event assembly, 6-63 image building) with two
  * documented fixes: the UPDATE before/after split keys on the
  * `### WHERE` / `### SET` section markers instead of
  * occurrence-counting (quirk Q10), and `@N=v` parsing splits on the
  * *first* `=` so literals containing `=` survive (log2sql.py:48
  * splits on every `=`).
  *
  * Hot loop is regex-free (indexOf parsing): String.split compiles a
  * Pattern per call and dominated throughput.
  *
  * Total: malformed/truncated input never throws — partial trailing
  * events are discarded, unknown lines ignored (SURVEY.md §5.2
  * property b).
  */
object BinlogFsm {

  private val DdlFirstWords = Set("create", "rename", "alter", "drop", "truncate")

  /** Text twin of [[graft.sources.BinlogBinary.headerPrevGtids]]:
    * mysqlbinlog prints the PREVIOUS_GTIDS_LOG_EVENT as a
    * `…\tPrevious-GTIDs` header line followed by `# uuid:i-j[,…]`
    * comment lines (or `# [empty]`). Scans only the file head; None =
    * header absent/malformed → the file's content is unknown. */
  def headerPrevGtids(lines: Iterator[String]): Option[GtidSet.Set] = {
    var inSet = false
    val parts = mutable.ArrayBuffer.empty[String]
    def finish(): Option[GtidSet.Set] =
      if (parts.isEmpty) Some(Map.empty)
      else try Some(GtidSet.parse(parts.mkString(",")))
      catch { case _: IllegalArgumentException => None }
    var n = 0
    while (lines.hasNext && n < 400) {
      val line = lines.next(); n += 1
      if (inSet) {
        val body = line.stripPrefix("#").trim.stripSuffix(",").trim
        if (line.startsWith("# at ") || !line.startsWith("#")) return finish()
        else if (body == "[empty]") return Some(Map.empty)
        else if (body.nonEmpty) parts += body
      } else if (line.contains("\tPrevious-GTIDs")) inSet = true
    }
    if (inSet) finish() else None
  }

  /** @param ddlOnly skip row-image (`###`) lines entirely — the
    *   dominant line volume — emitting only DDL events. Used for the
    *   schema-evolution timeline parse of GTID-pruned files, where row
    *   events are never rendered: seq numbers then count only DDL, which
    *   is safe because pruned files contribute no row events to compare
    *   against (cross-file ordering keys on the file name first). */
  def parse(file: String, lines: Iterator[String],
      includeDdl: Boolean = false,
      ddlOnly: Boolean = false): Iterator[RawChange] = new Iterator[RawChange] {

    private val pending = mutable.Queue.empty[RawChange]
    private var seqNo = 0L // emission order within the file (stream order)
    private var drainedTail = false

    // ≤3-line lookbehind over non-### lines; the reference keeps the
    // same ring so slot 0 is the `# at N` line and slot 1 the event
    // header when a row event starts (log2sql.py:67,93-94,106-107).
    private val ring = mutable.Queue.empty[String]

    // current row-statement being assembled
    private var op: String = null
    private var db: String = ""
    private var table: String = ""
    private var startPosRaw, stopPosRaw, dtRaw = ""
    private var startPos, stopPos = 0L
    private var section: Int = 0 // 0 none, 1 before, 2 after
    private val before = mutable.ListBuffer.empty[ColVal]
    private val after = mutable.ListBuffer.empty[ColVal]

    // DDL accumulation (log2sql.py:74-92)
    private var useDb = ""
    private var inDdl = false
    private val ddlParts = mutable.ListBuffer.empty[String]
    // last seen `# at N` / event-header fields, tracked continuously so
    // DDL events carry a position and header datetime too (mysqlbinlog,
    // which the reference delegates bound-filtering to, bounds ALL
    // events incl. Query/DDL); the ring alone can be overwritten by the
    // `use`/`SET TIMESTAMP` lines between the header and the statement.
    private var lastAtRaw, lastStopRaw, lastDtRaw = ""
    private var lastAtPos, lastStopPos = 0L
    // GTID framing scope (uuid:gno) — set by the SET @@SESSION
    // .GTID_NEXT line, carried onto every event until the next one
    private var curGtid = ""
    // ROWS_QUERY capture (binlog_rows_query_log_events=ON):
    // mysqlbinlog prints a `…\tRows_query` header followed by the
    // original statement as `# <line>` comments; the captured text is
    // carried onto the row events that follow and cleared after the
    // statement's closing rows event (its header prints STMT_END_F) —
    // the same scope the binary decoder keys on the event flags.
    private var curQuery: String = null
    private var inRowsQuery = false
    private val rqParts = mutable.ListBuffer.empty[String]
    private var clearQueryAtNextEvent = false

    private def flushDml(): Unit = {
      if (op != null) {
        pending.enqueue(RawChange(file, seqNo, startPos, stopPos, startPosRaw,
          stopPosRaw, dtRaw, db, table, op,
          before.map(_.ord).toArray, before.map(_.v).toArray,
          after.map(_.ord).toArray, after.map(_.v).toArray, null, curGtid,
          curQuery))
        seqNo += 1
        before.clear(); after.clear()
        op = null; section = 0
      }
    }

    private def longOf(s: String): Long =
      try s.trim.takeWhile(c => c.isDigit || c == '-').toLong
      catch { case _: Exception => 0L }

    /** `# at N` line → raw position substring after "at" (verbatim,
      * as the reference slices it — log2sql.py:101). Shared by the
      * DML ring lookbehind and the DDL lastAt* tracking. */
    private def atRawOf(line: String): String = {
      val i = line.indexOf("at")
      if (i >= 0) line.substring(i + 2) else ""
    }

    /** Event header line (`#<dt> server id N end_log_pos M [CRC32]`) →
      * (stopPosRaw, datetimeRaw) — raw substrings cut exactly like the
      * reference (log2sql.py:102-104): end_log_pos up to CRC32, the
      * datetime is everything before "server id" with `#` trimmed. */
    private def headerRawOf(line: String): (String, String) = {
      val elp = line.indexOf("end_log_pos")
      val stop = if (elp >= 0) {
        val rest = line.substring(elp + 11)
        val crc = rest.indexOf("CRC32")
        if (crc >= 0) rest.substring(0, crc) else rest
      } else ""
      val sid = line.indexOf("server id")
      val dtPart = if (sid >= 0) line.substring(0, sid) else ""
      val dt = dtPart.dropWhile(_ == '#').reverse.dropWhile(_ == '#').reverse
      (stop, dt)
    }

    private def processLine(line0: String): Unit = {
      val line = line0.stripLineEnd
      if (line.startsWith("###")) {
        if (ddlOnly) return // DDL-only fast path: no row-image work

        // Row-image pseudo-SQL. Strip the marker and the trailing
        // `/* TYPE meta … */` annotation (first `/*`, as the reference
        // does — log2sql.py:96).
        val noMark = line.replace("###", "")
        val cut = noMark.indexOf("/*")
        val body = if (cut >= 0) noMark.substring(0, cut) else noMark
        val trimmed = body.trim
        val lower = trimmed.toLowerCase
        if (trimmed.nonEmpty && trimmed.charAt(0) == '@') {
          val eq = trimmed.indexOf('=')
          if (eq > 1) {
            val ord = longOf(trimmed.substring(1, eq)).toInt
            val v = trimmed.substring(eq + 1)
            if (op != null) section match {
              case 1 => before += ColVal(ord, v)
              case _ => after += ColVal(ord, v) // SET image / insert values
            }
          }
        } else if (lower.startsWith("insert") || lower.startsWith("update") ||
            lower.startsWith("delete")) {
          flushDml() // a new `### <DML> db.t` header closes the previous row
          val sp0 = lower.indexOf(' ')
          op = if (sp0 > 0) lower.substring(0, sp0) else lower
          // last whitespace token = "`db`.`t`" (log2sql.py:21-24)
          val lastSp = trimmed.lastIndexWhere(Character.isWhitespace)
          val token = trimmed.substring(lastSp + 1)
          val dotAt = token.indexOf('.')
          def unquote(x: String) = x.stripPrefix("`").stripSuffix("`")
          if (dotAt >= 0) {
            db = unquote(token.substring(0, dotAt))
            table = unquote(token.substring(dotAt + 1))
          } else { db = unquote(token); table = "" }
          // position/datetime from the lookbehind, raw substrings kept
          // verbatim (log2sql.py:101-103)
          if (ring.size >= 2) {
            startPosRaw = atRawOf(ring(0))
            val (stopRaw, dtR) = headerRawOf(ring(1))
            stopPosRaw = stopRaw
            dtRaw = dtR
            startPos = longOf(startPosRaw)
            stopPos = longOf(stopPosRaw)
          }
          // DELETE rows open with `### WHERE`, INSERT with `### SET`;
          // initialize so values land in `before`/`after` respectively
          // even if a marker line were missing.
          section = if (op == "delete") 1 else 2
        } else if (lower == "where") {
          section = 1
        } else if (lower == "set") {
          section = 2
        }
        // anything else inside an event (unknown marker) is ignored
      } else {
        // non-### line: ends any in-flight row statement
        flushDml()
        // Rows_query statement comments: every `# <text>` line after
        // the Rows_query header (stopping at the next event's `# at`)
        // is a line of the original statement, captured verbatim
        if (inRowsQuery) {
          if (line.startsWith("# ") && !line.startsWith("# at ")) {
            rqParts += line.substring(2)
            ring += line
            if (ring.size == 3) ring.dequeue()
            return
          } else {
            inRowsQuery = false
            if (rqParts.nonEmpty) curQuery = rqParts.mkString("\n")
            rqParts.clear()
          }
        }
        // track position/header fields for the DDL path (DML reads the
        // ring exactly as the reference does, log2sql.py:101-104)
        if (line.startsWith("# at ")) {
          // the previous event is fully consumed here: if its rows
          // header carried STMT_END_F, the ROWS_QUERY scope ends with
          // it (all its row images were flushed above)
          if (clearQueryAtNextEvent) { curQuery = null; clearQueryAtNextEvent = false }
          lastAtRaw = atRawOf(line)
          lastAtPos = longOf(lastAtRaw)
        } else if (line.startsWith("SET @@SESSION.GTID_NEXT=")) {
          // mysqlbinlog prints the GTID framing event as
          // `SET @@SESSION.GTID_NEXT= 'uuid:gno'/*!*/;` — capture the
          // quoted value; AUTOMATIC/ANONYMOUS reset the scope
          val q1 = line.indexOf('\'')
          val q2 = if (q1 >= 0) line.indexOf('\'', q1 + 1) else -1
          val v = if (q2 > q1) line.substring(q1 + 1, q2) else ""
          curGtid = if (v.contains(':')) v.toLowerCase else ""
        } else if (line.startsWith("#") && line.contains("end_log_pos")) {
          val (stopRaw, dtR) = headerRawOf(line)
          lastStopRaw = stopRaw
          lastStopPos = longOf(lastStopRaw)
          lastDtRaw = dtR
          if (line.contains("\tRows_query")) {
            inRowsQuery = true
            rqParts.clear()
          } else if (line.contains("STMT_END_F")) {
            // a rows-event header: its row images follow as ### lines;
            // defer the ROWS_QUERY clear to the next `# at`
            clearQueryAtNextEvent = true
          }
        }
        if (includeDdl) {
          val stripped = line.trim
          // `use `db`/*!*/;` context tracking (log2sql.py:78-79)
          if (stripped.take(3).toLowerCase == "use")
            useDb = stripped.replace("/*!*/;", ";")
          val fsp = stripped.indexOf(' ')
          val firstWord =
            (if (fsp > 0) stripped.substring(0, fsp) else stripped).toLowerCase
          if (DdlFirstWords.contains(firstWord) || inDdl) {
            inDdl = true
            if (!stripped.startsWith("--")) ddlParts += stripped
            if (stripped == "/*!*/;") {
              // The reference joins statement lines with NO separator
              // and appends ';' (log2sql.py:13-14, quirk Q29 mangles
              // multi-line DDL); the engine default joins with newline.
              val stmt = ddlParts.dropRight(1) // drop the `/*!*/;`
              val text = (Seq(useDb) ++ stmt).filter(_.nonEmpty)
                .mkString("\n") + ";"
              pending.enqueue(RawChange(file, seqNo, lastAtPos, lastStopPos,
                lastAtRaw, lastStopRaw, lastDtRaw, "", "",
                "ddl", Array.emptyIntArray, Array.empty[String],
                Array.emptyIntArray, Array.empty[String], text, curGtid))
              seqNo += 1
              useDb = ""
              inDdl = false
              ddlParts.clear()
            }
          }
        }
        ring += line
        if (ring.size == 3) ring.dequeue()
      }
    }

    override def hasNext: Boolean = {
      while (pending.isEmpty && lines.hasNext) processLine(lines.next())
      if (pending.isEmpty && !drainedTail) {
        drainedTail = true
        flushDml() // EOF closes a trailing row statement (total on truncation)
      }
      pending.nonEmpty
    }

    override def next(): RawChange = {
      if (!hasNext) throw new NoSuchElementException("BinlogFsm")
      pending.dequeue()
    }
  }
}
