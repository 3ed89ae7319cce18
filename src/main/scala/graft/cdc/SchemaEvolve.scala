package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** DDL-aware catalog evolution (beyond the reference, which resolves
  * every event against the LIVE information_schema at conversion time
  * — /root/reference/log2sql.py:29-46 — so a log spanning an
  * `ALTER TABLE` decodes post-ALTER events with pre-ALTER names, or
  * pre-ALTER events with post-ALTER names, whichever the catalog
  * happens to hold "now").
  *
  * The engine instead VERSIONS the catalog by log position: the base
  * snapshot holds the schema in effect at the log's start, and every
  * schema-changing DDL *in the log itself* produces a new version
  * effective from its (file, seq). Each row event resolves ordinals
  * against the version in effect at ITS position — the decode is a
  * pure function of (base catalog, log), reproducible forever.
  *
  * Scope: `ALTER TABLE [db.]t ADD COLUMN c … [FIRST | AFTER x]` and
  * `ALTER TABLE [db.]t DROP COLUMN c` — the evolutions that change
  * the ordinal→name mapping row events are keyed by. (MySQL
  * re-numbers ordinals on both; versions store the full name list so
  * renumbering falls out of list position.) Other DDL passes through
  * untouched. Tables absent from the base catalog stay unresolved —
  * an ALTER cannot conjure the columns the base never declared.
  *
  * Scale: DDL statements are human-issued — thousands per log era
  * against billions of row events — so the timeline fold is a bounded
  * driver-side collect (the same contract as the catalog dim itself)
  * and ships to executors inside the render closure; per-event
  * resolution is a reverse linear probe over that table's few
  * versions. No extra shuffle anywhere.
  */
object SchemaEvolve {

  /** Per-table version timeline, ascending by (file, seq): the names
    * list in ordinal order, effective for events AFTER that position.
    * The base version sits at ("", -1). */
  type Timelines = Map[(String, String), Vector[(String, Long, IndexedSeq[String])]]

  private val Ident = "`?([A-Za-z0-9_$]+)`?"
  private val AddRe =
    (s"""(?is)\\s*alter\\s+table\\s+(?:$Ident\\s*\\.\\s*)?$Ident\\s+""" +
      s"""add\\s+column\\s+$Ident\\b(.*)""").r
  private val DropRe =
    (s"""(?is)\\s*alter\\s+table\\s+(?:$Ident\\s*\\.\\s*)?$Ident\\s+""" +
      s"""drop\\s+column\\s+$Ident\\s*;?\\s*""").r
  private val FirstRe = """(?is).*\bfirst\s*;?\s*$""".r
  private val AfterRe = ("""(?is).*\bafter\s+""" + Ident + """\s*;?\s*$""").r

  private[cdc] sealed trait Change
  private[cdc] final case class Add(colName: String,
      first: Boolean, after: Option[String]) extends Change
  private[cdc] final case class Drop(colName: String) extends Change

  private val UseRe = s"""(?is)\\s*use\\s+$Ident\\s*;?\\s*""".r

  /** Parse one DDL statement (possibly multi-line: the FSM prepends
    * the `use` context line and joins with \n — BinlogFsm DDL branch).
    * Returns ((db, table), change); db comes from the statement's own
    * qualifier, else the embedded `use` line, else `defaultDb`. */
  private[cdc] def parseDdl(ddl: String, defaultDb: String)
      : Option[((String, String), Change)] = {
    val lines = ddl.linesIterator.toSeq
    val useDb = lines.headOption.collect { case UseRe(u) => u }
    val fallbackDb = useDb.orElse(Option(defaultDb).filter(_.nonEmpty))
      .getOrElse("")
    val stmt = lines.lastOption.getOrElse(ddl)
    stmt match {
      case AddRe(db, tbl, colName, rest) =>
        val place = rest match {
          case FirstRe() => Add(colName, first = true, after = None)
          case AfterRe(a) => Add(colName, first = false, after = Some(a))
          case _ => Add(colName, first = false, after = None)
        }
        Some(((Option(db).getOrElse(fallbackDb), tbl), place))
      case DropRe(db, tbl, colName) =>
        Some(((Option(db).getOrElse(fallbackDb), tbl), Drop(colName)))
      case _ => None
    }
  }

  private def applyChange(names: IndexedSeq[String], c: Change): IndexedSeq[String] =
    c match {
      case Add(n, _, _) if names.contains(n) => names // idempotent replay
      case Add(n, true, _) => n +: names
      case Add(n, false, Some(a)) =>
        val i = names.indexOf(a)
        if (i < 0) names :+ n else (names.take(i + 1) :+ n) ++ names.drop(i + 1)
      case Add(n, false, None) => names :+ n
      case Drop(n) => names.filterNot(_ == n)
    }

  /** Fold the log's schema-changing DDL into per-table timelines.
    *
    * @param events  parsed change events INCLUDING ddl ops (pre-filter:
    *                user filters must not hide schema history)
    * @param catalog resolved base catalog (db, table, cols, key_cols) */
  def timelines(events: DataFrame, catalog: DataFrame): Timelines = {
    // both collects bounded by contract: catalog = dim table; DDL =
    // human-issued statements, vanishingly rare next to row events
    val base: Map[(String, String), IndexedSeq[String]] = catalog
      .select(col("db"), col("table"), col("cols"))
      .collect()
      .map { r =>
        val names = r.getSeq[org.apache.spark.sql.Row](2)
          .sortBy(_.getInt(0)).map(_.getString(1)).toIndexedSeq
        (r.getString(0), r.getString(1)) -> names
      }.toMap
    val ddls = events.filter(col("op") === "ddl")
      .select(col("file"), col("seq"), col("db"), col("ddl"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val acc = scala.collection.mutable.Map.empty[
      (String, String), Vector[(String, Long, IndexedSeq[String])]]
    base.foreach { case (k, names) => acc(k) = Vector(("", -1L, names)) }
    ddls.foreach { case (file, seq, db, ddl) =>
      parseDdl(ddl, db).foreach { case (key, change) =>
        acc.get(key).foreach { tv =>
          acc(key) = tv :+ ((file, seq, applyChange(tv.last._3, change)))
        }
      }
    }
    // tables never altered need no versioned lookup — drop them so the
    // render path takes the plain broadcast-catalog branch
    acc.filter(_._2.length > 1).toMap
  }

  /** Column names in effect for an event at (file, seq): the last
    * version strictly BEFORE it (a row event never shares a position
    * with the ALTER that precedes it). Reverse linear probe — version
    * counts are tiny by the same contract that bounded the collect. */
  def colsAt(tv: Vector[(String, Long, IndexedSeq[String])],
      file: String, seq: Long): Seq[(Int, String)] = {
    var i = tv.length - 1
    while (i > 0 && !(tv(i)._1 < file || (tv(i)._1 == file && tv(i)._2 < seq)))
      i -= 1
    tv(i)._3.zipWithIndex.map { case (n, j) => (j + 1, n) }
  }
}
