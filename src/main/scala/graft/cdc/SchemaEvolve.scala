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
  * Scope: `ALTER TABLE [db.]t` with any comma-separated mix of
  * `ADD [COLUMN] c … [FIRST | AFTER x]`, `DROP [COLUMN] c`,
  * `RENAME COLUMN a TO b`, `CHANGE a b …` and `MODIFY c … FIRST/AFTER`
  * — the evolutions that change the ordinal→name mapping row events
  * are keyed by. (MySQL re-numbers ordinals; versions store the full
  * name list so renumbering falls out of list position.) Clauses that
  * cannot affect the mapping (indexes, ALGORITHM/LOCK, charset,
  * type-only MODIFY …) are ignored; a statement containing ANY
  * unrecognized clause is skipped WHOLE — a partial application would
  * misalign every later ordinal, the exact failure this flag exists
  * to prevent. Other DDL passes through untouched. Tables absent from
  * the base catalog stay unresolved — an ALTER cannot conjure the
  * columns the base never declared.
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
  private val AlterHeadRe =
    (s"""(?is)\\s*alter\\s+(?:online\\s+|offline\\s+)?(?:ignore\\s+)?table\\s+""" +
      s"""(?:$Ident\\s*\\.\\s*)?$Ident\\s+(.*?)\\s*;?\\s*""").r
  private val AddColRe =
    s"""(?is)\\s*add\\s+(?:column\\s+)?(`?)([A-Za-z0-9_$$]+)`?\\b(.*)""".r
  private val DropColRe =
    s"""(?is)\\s*drop\\s+(?:column\\s+)?(`?)([A-Za-z0-9_$$]+)`?\\b(.*)""".r
  private val ModifyRe =
    s"""(?is)\\s*modify\\s+(?:column\\s+)?$Ident\\b(.*)""".r
  private val ChangeRe =
    s"""(?is)\\s*change\\s+(?:column\\s+)?$Ident\\s+$Ident\\b(.*)""".r
  private val RenameColRe =
    s"""(?is)\\s*rename\\s+column\\s+$Ident\\s+to\\s+$Ident\\s*""".r
  private val FirstRe = """(?is).*\bfirst\s*$""".r
  private val AfterRe = ("""(?is).*\bafter\s+""" + Ident + """\s*$""").r
  // ordinal-neutral clauses: the name list row events key on is untouched
  private val NeutralRe = ("""(?is)\s*(?:rename\s+(?:index|key)\b.*|""" +
    """alter\s+(?:column\s+)?[`A-Za-z0-9_$]+\s+(?:set|drop)\s+default\b.*|""" +
    """(?:algorithm|lock|engine|auto_increment|comment|row_format)\s*=?.*|""" +
    """(?:default\s+)?(?:character\s+set|charset|collate)\b.*|""" +
    """convert\s+to\s+character\s+set\b.*|order\s+by\b.*|""" +
    """(?:enable|disable)\s+keys\s*|force\s*)""").r
  // bare (unquoted) first idents after ADD/DROP that are NOT column names
  private val AddReserved = Set("index", "key", "unique", "fulltext",
    "spatial", "constraint", "primary", "foreign", "partition", "check")
  private val DropReserved = Set("index", "key", "primary", "foreign",
    "constraint", "check", "partition")

  private[cdc] sealed trait Change
  private[cdc] final case class Add(colName: String,
      first: Boolean, after: Option[String]) extends Change
  private[cdc] final case class Drop(colName: String) extends Change
  private[cdc] final case class Rename(from: String, to: String) extends Change
  private[cdc] final case class Move(colName: String,
      first: Boolean, after: Option[String]) extends Change

  private val UseRe = s"""(?is)\\s*use\\s+$Ident\\s*;?\\s*""".r
  private val ContextRe = """(?is)\s*(use\s.*|set\s+timestamp\s*=.*|--.*)""".r

  /** Split an ALTER body at top-level commas — commas inside parens
    * (`DECIMAL(10,2)`, index column lists) or quotes never split.
    * Inside ' or " literals a backslash escapes the next character
    * (MySQL string syntax: `DEFAULT 'it\'s, ok'` must not split);
    * backticked identifiers have no backslash escape. Doubled-quote
    * escapes (`'it''s'`) need no special case — the naive toggle
    * closes and immediately reopens, keeping the comma quoted. */
  private[cdc] def splitClauses(body: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var escaped = false
    body.foreach { ch =>
      if (quote != 0) {
        cur += ch
        if (escaped) escaped = false
        else if (ch == '\\' && quote != '`') escaped = true
        else if (ch == quote) quote = 0
      }
      else ch match {
        case '`' | '\'' | '"' => quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** Classify one change clause: Some(Some(c)) = ordinal change,
    * Some(None) = recognized-but-neutral, None = unrecognized (the
    * whole statement must then be skipped, never partially applied). */
  private def parseClause(clause: String): Option[Option[Change]] = {
    def placed(rest: String, mk: (Boolean, Option[String]) => Change)
        : Option[Option[Change]] = rest match {
      case FirstRe() => Some(Some(mk(true, None)))
      case AfterRe(a) => Some(Some(mk(false, Some(a))))
      case _ => Some(Some(mk(false, None)))
    }
    clause match {
      case NeutralRe() => Some(None)
      case AddColRe(q, name, rest) =>
        if (q.isEmpty && AddReserved(name.toLowerCase)) Some(None)
        else placed(rest.trim, (f, a) => Add(name, f, a))
      case RenameColRe(from, to) => Some(Some(Rename(from, to)))
      case DropColRe(q, name, rest) =>
        if (q.isEmpty && DropReserved(name.toLowerCase)) Some(None)
        else if (rest.trim.nonEmpty) None // trailing tokens: not a plain drop
        else Some(Some(Drop(name)))
      case ModifyRe(name, rest) => rest.trim match {
        case FirstRe() => Some(Some(Move(name, first = true, after = None)))
        case AfterRe(a) => Some(Some(Move(name, first = false, after = Some(a))))
        case _ => Some(None) // type-only MODIFY keeps name and ordinal
      }
      case ChangeRe(from, to, rest) => rest.trim match {
        // CHANGE renames (and may reorder); model as Rename then Move
        case FirstRe() => Some(Some(Rename(from, to))) // Move folded below
        case AfterRe(_) => Some(Some(Rename(from, to)))
        case _ => Some(Some(Rename(from, to)))
      }
      case _ => None
    }
  }

  /** CHANGE with FIRST/AFTER needs a second change (the move of the
    * NEW name); parseClause returns one Change, so expand here. */
  private def expandClause(clause: String): Option[Seq[Change]] =
    parseClause(clause).map {
      case Some(r @ Rename(_, to)) =>
        clause match {
          case ChangeRe(_, _, rest) => rest.trim match {
            case FirstRe() => Seq(r, Move(to, first = true, after = None))
            case AfterRe(a) => Seq(r, Move(to, first = false, after = Some(a)))
            case _ => Seq(r)
          }
          case _ => Seq(r)
        }
      case Some(c) => Seq(c)
      case None => Nil
    }

  /** Parse one DDL statement (possibly multi-line: the FSM prepends
    * the `use` context line and joins statement lines with \n —
    * BinlogFsm DDL branch). Returns ((db, table), ordered changes);
    * db comes from the statement's own qualifier, else the embedded
    * `use` line, else `defaultDb`.
    *
    * None when the statement is not a schema-relevant ALTER, OR when
    * ANY change clause is unrecognized — a partial application would
    * misalign every later ordinal, the exact failure `--evolve-schema`
    * exists to prevent, so unrecognized ALTERs skip versioning whole. */
  private[cdc] def parseDdl(ddl: String, defaultDb: String)
      : Option[((String, String), Seq[Change])] = {
    val lines = ddl.linesIterator.toSeq
    val useDb = lines.headOption.collect { case UseRe(u) => u }
    val fallbackDb = useDb.orElse(Option(defaultDb).filter(_.nonEmpty))
      .getOrElse("")
    // drop leading context lines (use/SET TIMESTAMP/comments), then
    // join the remaining statement lines with a space: mysqlbinlog
    // reproduces multi-line ALTERs verbatim as issued
    val stmt = lines.dropWhile {
      case ContextRe(_) => true
      case l => l.trim.isEmpty
    }.mkString(" ")
    stmt match {
      case AlterHeadRe(db, tbl, body) =>
        val clauses = splitClauses(body).map(expandClause)
        if (clauses.exists(_.isEmpty)) None // unrecognized clause → skip whole
        else {
          val changes = clauses.flatMap(_.get)
          if (changes.isEmpty) None // neutral-only ALTER: no version bump
          else Some(((Option(db).getOrElse(fallbackDb), tbl), changes))
        }
      case _ => None
    }
  }

  private def insertAt(names: IndexedSeq[String], n: String,
      first: Boolean, after: Option[String]): IndexedSeq[String] =
    if (first) n +: names
    else after match {
      case Some(a) =>
        val i = names.indexOf(a)
        if (i < 0) names :+ n else (names.take(i + 1) :+ n) ++ names.drop(i + 1)
      case None => names :+ n
    }

  private[cdc] def applyChange(names: IndexedSeq[String], c: Change): IndexedSeq[String] =
    c match {
      case Add(n, _, _) if names.contains(n) => names // idempotent replay
      case Add(n, f, a) => insertAt(names, n, f, a)
      case Drop(n) => names.filterNot(_ == n)
      case Rename(from, to) => names.map(x => if (x == from) to else x)
      case Move(n, f, a) =>
        if (!names.contains(n)) names
        else insertAt(names.filterNot(_ == n), n, f, a)
    }

  /** Base schemas from the resolved catalog — the bounded driver
    * collect (dim-table contract) the timeline fold starts from.
    * Computed ONCE per run/stream; streaming callers hold it across
    * micro-batches. */
  def baseOf(catalog: DataFrame): Map[(String, String), IndexedSeq[String]] =
    catalog
      .select(col("db"), col("table"), col("cols"))
      .collect()
      .map { r =>
        val names = r.getSeq[org.apache.spark.sql.Row](2)
          .sortBy(_.getInt(0)).map(_.getString(1)).toIndexedSeq
        (r.getString(0), r.getString(1)) -> names
      }.toMap

  /** Fold collected DDL statements (file, seq, db, ddl) into
    * per-table timelines over `base`. Sorts by (file, seq) INTERNALLY,
    * so the fold is a pure function of the DDL *set* — arrival order
    * (batch scan order, streaming micro-batch order, catch-up replay)
    * cannot change the result (commutativity spec'd in CdcStreamSpec).
    * This is the incremental streaming state recompute too: DDL is
    * human-issued and vanishingly rare next to row events, so a
    * from-scratch refold per micro-batch is O(#ddl · #versions) over a
    * tiny set — cheaper and safer than maintaining sorted-insert
    * version vectors. */
  def foldDdls(base: Map[(String, String), IndexedSeq[String]],
      ddls: Seq[(String, Long, String, String)]): Timelines = {
    val acc = scala.collection.mutable.Map.empty[
      (String, String), Vector[(String, Long, IndexedSeq[String])]]
    base.foreach { case (k, names) => acc(k) = Vector(("", -1L, names)) }
    ddls.sortBy(t => (t._1, t._2)).foreach { case (file, seq, db, ddl) =>
      parseDdl(ddl, db).foreach { case (key, changes) =>
        acc.get(key).foreach { tv =>
          acc(key) = tv :+ ((file, seq, changes.foldLeft(tv.last._3)(applyChange)))
        }
      }
    }
    // tables never altered need no versioned lookup — drop them so the
    // render path takes the plain broadcast-catalog branch
    acc.filter(_._2.length > 1).toMap
  }

  /** Fold the log's schema-changing DDL into per-table timelines.
    *
    * @param events  parsed change events INCLUDING ddl ops (pre-filter:
    *                user filters must not hide schema history)
    * @param catalog resolved base catalog (db, table, cols, key_cols) */
  def timelines(events: DataFrame, catalog: DataFrame): Timelines = {
    // both collects bounded by contract: catalog = dim table; DDL =
    // human-issued statements, vanishingly rare next to row events
    val ddls = events.filter(col("op") === "ddl")
      .select(col("file"), col("seq"), col("db"), col("ddl"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq
    foldDdls(baseOf(catalog), ddls)
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
