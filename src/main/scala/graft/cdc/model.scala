package graft.cdc

/** One column image value as printed by `mysqlbinlog -vv`: the ordinal
  * from `@N=` and the raw SQL-literal string (quotes kept, `NULL` bare)
  * — reference carries values verbatim (/root/reference/log2sql.py:48,
  * SURVEY.md §1.2), and so do we: lossless, no re-quoting bugs.
  */
final case class ColVal(ord: Int, v: String)

/** A parsed change event (SURVEY.md §1.1 #2). One record per row-image
  * statement (a multi-row Write_rows yields several events sharing one
  * position comment, like the reference's per-`### INSERT` grouping,
  * /root/reference/log2sql.py:97-105).
  *
  * For `op=insert` only `after` is set; `op=delete` only `before`;
  * `op=update` both (WHERE image → before, SET image → after — split on
  * the `### WHERE`/`### SET` section markers, fixing reference quirk
  * Q10 which counted occurrences). `op=ddl` carries the statement in
  * `ddl` and has no images.
  *
  * `startPosRaw`/`stopPosRaw`/`dtRaw` keep the reference's verbatim
  * substring spacing so the emitted position comment is byte-identical
  * (/root/reference/log2sql.py:101-104); `startPos`/`stopPos` are the
  * parsed values used for filtering and ordering.
  */
final case class RawChange(
    file: String,
    seq: Long,
    startPos: Long,
    stopPos: Long,
    startPosRaw: String,
    stopPosRaw: String,
    dtRaw: String,
    db: String,
    table: String,
    op: String,
    beforeOrds: Array[Int],
    beforeVals: Array[String],
    afterOrds: Array[Int],
    afterVals: Array[String],
    ddl: String,
    /** The transaction's GTID ("uuid:gno", lowercase uuid) from the
      * GTID framing event preceding the row events — empty when the
      * stream carries none (GTID_MODE=OFF / pre-5.6). Both decoders
      * populate it: the binary path from GTID_LOG_EVENT, the text FSM
      * from the `SET @@SESSION.GTID_NEXT` line mysqlbinlog prints for
      * it. Drives `--include-gtids`/`--exclude-gtids`. */
    gtid: String = "",
    /** The ORIGINAL statement text from ROWS_QUERY_LOG_EVENT when the
      * server logs it (`binlog_rows_query_log_events=ON`) — the
      * debugging breadcrumb the binlog2sql lineage surfaces. Null when
      * absent (the common case); set only on row events, scoped to the
      * statement (cleared at its STMT_END_F rows event). Both decoders
      * populate it: the binary path from event type 29, the text FSM
      * from mysqlbinlog's `Rows_query` header + `# <stmt>` comments. */
    query: String = null) {

  // Images are stored as parallel primitive arrays: the Catalyst
  // product encoder for ARRAY<STRUCT<...>> deserializes per-element
  // per-field and dominated parse throughput (~6x) vs flat arrays.
  def before: Seq[ColVal] =
    beforeOrds.indices.map(i => ColVal(beforeOrds(i), beforeVals(i)))
  def after: Seq[ColVal] =
    afterOrds.indices.map(i => ColVal(afterOrds(i), afterVals(i)))

  /** The reference's per-event metadata comment, byte-for-byte
    * (/root/reference/log2sql.py:101-103). */
  def posComment: String =
    s"# start-pos:$startPosRaw; stop-pos:$stopPosRaw; datetime: $dtRaw"
}

/** Resolved per-table catalog entry (SURVEY.md O11/O12): ordinal→name
  * for every column, plus the key column set — primary key, else the
  * first unique index, else empty (keyless ⇒ WHERE lists all columns,
  * quirk Q1).
  */
final case class CatalogEntry(
    db: String,
    table: String,
    cols: Seq[(Int, String)],
    keyCols: Seq[String])

/** Catalog column as carried through the render join. */
final case class OrdName(ord: Int, name: String)

/** Typed row into SqlRender (post catalog join; catalog side nullable
  * for unknown tables). */
final case class RenderIn(
    file: String, seq: Long, start_pos: Long, pos_comment: String,
    db: String, table: String, op: String,
    beforeOrds: Array[Int], beforeVals: Array[String],
    afterOrds: Array[Int], afterVals: Array[String], ddl: Option[String],
    cols: Option[Seq[OrdName]], key_cols: Option[Seq[String]]) {
  def before: Seq[ColVal] =
    beforeOrds.indices.map(i => ColVal(beforeOrds(i), beforeVals(i)))
  def after: Seq[ColVal] =
    afterOrds.indices.map(i => ColVal(afterOrds(i), afterVals(i)))
}

/** Rendered output row. */
final case class RenderOut(file: String, seq: Long, start_pos: Long, op: String, sql: String)

/** Engine configuration mirroring the reference CLI surface (O1,
  * /root/reference/main.py:17-39) plus the engine's fixed options
  * (SURVEY.md §2.2): `bugCompatible` reproduces reference quirks Q3
  * (after-image key in forward updates) and Q29 (DDL lines joined with
  * no separator); `includeDdl` is the real switch Q4 never had.
  */
final case class CdcConfig(
    sqlTypes: Seq[String] = Seq("insert", "update", "delete"),
    database: String = "",
    tables: Seq[String] = Nil,
    startPos: Option[Long] = None,
    stopPos: Option[Long] = None,
    /** O4 time-range: "yyyy-MM-dd HH:mm:ss" bounds compared against the
      * event-header datetime (reference delegates to mysqlbinlog flags,
      * main.py:60-63; the engine filters parsed event timestamps). */
    startDatetime: Option[String] = None,
    stopDatetime: Option[String] = None,
    flashback: Boolean = false,
    includeDdl: Boolean = false,
    bugCompatible: Boolean = false,
    /** `-K/--no-primary-key`: strip PK columns from generated INSERTs
      * (the binlog2sql semantic; the reference parses the flag but
      * never reads it — quirk Q5, /root/reference/main.py:79-81). */
    noPk: Boolean = false,
    /** `--back-interval F`: seconds to pause between 1000-statement
      * flashback chunks at the output sink — the throttle the
      * reference DECLARES but never reads (dead code, main.py:83-84;
      * the upstream binlog2sql semantic it copied). Implemented here:
      * output bytes are identical (parity-safe), only emission pacing
      * changes, and only when `flashback` is set. */
    backInterval: Double = 0.0,
    /** `--format text|binary|auto` (beyond the reference): which
      * decoder reads `--binlog`. `auto` (default) sniffs the first
      * file's magic bytes — raw `.binlog` files (0xFE 'b' 'i' 'n')
      * take the binary decoder, everything else the `mysqlbinlog -vv`
      * text FSM — so a user can point the CLI straight at the
      * server's binlog directory and skip the mysqlbinlog step. */
    format: String = "auto",
    /** `--include-gtids`/`--exclude-gtids` (beyond the reference; the
      * mysqlbinlog flags the reference's delegation model would pass
      * through): GTID-set syntax `uuid:i[-j][:k[-l]…][,uuid:…]`.
      * Include keeps only row/DDL events whose framing GTID falls in
      * the set (events with no GTID drop — they cannot match);
      * exclude drops matching events and keeps GTID-less ones. */
    includeGtids: Option[String] = None,
    excludeGtids: Option[String] = None,
    /** `--evolve-schema` (beyond the reference): version the catalog
      * by log position — every `ALTER TABLE ADD/DROP COLUMN` in the
      * log itself produces a new schema version effective from its
      * (file, seq), and each row event resolves ordinals against the
      * version in effect at ITS position (SchemaEvolve). The
      * reference resolves everything against the live
      * information_schema "now", so logs spanning an ALTER decode
      * with the wrong column names on one side of it. */
    evolveSchema: Boolean = false)

/** Parsed GTID set (`uuid:1-5:8,uuid2:3`): uuid → closed intervals.
  * Mirrors mysqlbinlog's Gtid_set text syntax (public format). */
object GtidSet {
  def parse(s: String): Map[String, Seq[(Long, Long)]] = {
    require(s.split(',').exists(_.trim.nonEmpty),
      s"empty GTID set '$s' — expected uuid:i[-j][,uuid:…]")
    s.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { part =>
      val ps = part.split(':')
      require(ps.length >= 2, s"GTID set '$part' lacks an interval")
      val ivs = ps.drop(1).toSeq.map { r =>
        r.split('-') match {
          case Array(a) => (a.trim.toLong, a.trim.toLong)
          case Array(a, b) => (a.trim.toLong, b.trim.toLong)
          case _ => throw new IllegalArgumentException(
            s"bad GTID interval '$r' in '$part'")
        }
      }
      ps(0).trim.toLowerCase -> ivs
    }.toSeq
      // the same uuid may appear in several comma parts: union them
      .groupBy(_._1).map { case (u, vs) => u -> vs.flatMap(_._2) }
  }

  type Set = Map[String, Seq[(Long, Long)]]

  /** Sorted, coalesced interval list (closed intervals). */
  private def norm(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val s = ivs.filter(iv => iv._2 >= iv._1).sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    s.foreach { case (lo, hi) =>
      if (out.nonEmpty && lo <= out.last._2 + 1)
        out(out.size - 1) = (out.last._1, math.max(out.last._2, hi))
      else out += ((lo, hi))
    }
    out.toSeq
  }

  /** Set algebra over GTID sets — drives the file-skip index
    * (GtidPrune): a binlog file whose PREVIOUS_GTIDS header proves the
    * requested set disjoint from the file's content is never decoded. */
  def isEmpty(a: Set): Boolean =
    a.forall { case (_, ivs) => norm(ivs).isEmpty }

  def intersect(a: Set, b: Set): Set =
    a.flatMap { case (u, ai) =>
      b.get(u).map { bi =>
        val bn = norm(bi)
        u -> norm(ai).flatMap { case (lo, hi) =>
          bn.collect { case (blo, bhi) if blo <= hi && lo <= bhi =>
            (math.max(lo, blo), math.min(hi, bhi)) }
        }
      }
    }.filter(_._2.nonEmpty)

  def subtract(a: Set, b: Set): Set =
    a.map { case (u, ai) =>
      val bn = norm(b.getOrElse(u, Nil))
      u -> norm(ai).flatMap { iv =>
        bn.foldLeft(Seq(iv)) { (acc, cut) =>
          acc.flatMap { case (lo, hi) =>
            if (cut._2 < lo || cut._1 > hi) Seq((lo, hi))
            else Seq((lo, cut._1 - 1), (cut._2 + 1, hi)).filter(p => p._2 >= p._1)
          }
        }
      }
    }.filter(_._2.nonEmpty)

  def isSubset(a: Set, b: Set): Boolean = isEmpty(subtract(a, b))
}
