package graft.cdc

/** Forward / flashback SQL generation (reference O19–O25,
  * /root/reference/log2sql.py:127-185). Pure Scala — `CdcJob` wraps it
  * in a Spark UDF after the broadcast catalog join.
  *
  * Key-selection semantics (SURVEY.md §2.2):
  *  - keyed table → WHERE uses the key columns only; keyless → WHERE
  *    lists every column of the row image (quirk Q1), always `LIMIT 1`
  *    (Q2), `NULL` renders as `IS NULL` (O25).
  *  - forward UPDATE keys on the *before* image (the row that exists);
  *    flashback UPDATE keys on the *after* image. The reference keys
  *    both on the after image because later images overwrite its
  *    `index_info` (log2sql.py:57-58, quirk Q3 — wrong row targeted
  *    when the key itself changes); `bugCompatible = true` reproduces
  *    that.
  */
object SqlRender {

  private def name(cols: Map[Int, String], cv: ColVal): String =
    cols.getOrElse(cv.ord, s"@${cv.ord}")

  /** `` `c`=v `` or `` `c` IS NULL `` (log2sql.py:127-132). */
  private def eq(k: String, v: String): String =
    if (v == "NULL") s"`$k` IS NULL" else s"`$k`=$v"

  private def predicate(cols: Map[Int, String], image: Seq[ColVal],
      keyCols: Set[String]): String = {
    val keyed =
      if (keyCols.isEmpty) image
      else image.filter(cv => keyCols.contains(name(cols, cv)))
    val use = if (keyed.isEmpty) image else keyed
    use.map(cv => eq(name(cols, cv), cv.v)).mkString(" AND ")
  }

  private def setList(cols: Map[Int, String], image: Seq[ColVal]): String =
    image.map(cv => s"`${name(cols, cv)}`=${cv.v}").mkString(", ")

  private def insertSql(schema: String, cols: Map[Int, String],
      image: Seq[ColVal], dropCols: Set[String] = Set.empty): String = {
    val kept =
      if (dropCols.isEmpty) image
      else image.filterNot(cv => dropCols.contains(name(cols, cv)))
    val names = kept.map(cv => s"`${name(cols, cv)}`").mkString(", ")
    val vals = kept.map(_.v).mkString(", ")
    s"INSERT INTO $schema($names) VALUES ($vals);"
  }

  /** Render one change event to a SQL statement; `null` for ops
    * outside the insert/update/delete/ddl set. */
  def render(op: String, db: String, table: String,
      before: Seq[ColVal], after: Seq[ColVal], ddl: String,
      catalogCols: Seq[(Int, String)], keyColsSeq: Seq[String],
      flashback: Boolean, bugCompatible: Boolean,
      noPk: Boolean = false): String = {
    if (op == "ddl") return {
      if (ddl == null) null
      // Q29 bug-compatibility: the reference joins a DDL statement's
      // captured lines (use-context included) with NO separator
      // (log2sql.py:79 `"".join(sql_info_all[1:-1]) + ";"`); the
      // engine default joins with newline. Parts carry no newlines
      // themselves, so stripping them reproduces the join exactly.
      else if (bugCompatible) ddl.replace("\n", "")
      else ddl
    }
    val schema = s"`$db`.`$table`"
    val cols = catalogCols.toMap
    val keyCols = keyColsSeq.toSet
    // -K semantics: INSERTs omit the key columns (auto-increment
    // re-assignment on replay); WHERE clauses keep them.
    val insDrop = if (noPk) keyCols else Set.empty[String]
    (op, flashback) match {
      case ("insert", false) => insertSql(schema, cols, after, insDrop)
      case ("insert", true) => // undo: delete the inserted row
        s"DELETE FROM $schema WHERE ${predicate(cols, after, keyCols)} LIMIT 1;"
      case ("delete", false) =>
        s"DELETE FROM $schema WHERE ${predicate(cols, before, keyCols)} LIMIT 1;"
      case ("delete", true) => // undo: re-insert the deleted row
        insertSql(schema, cols, before, insDrop)
      case ("update", false) =>
        // Q3 only bites keyed tables: with no key the reference falls
        // back to the full *before* image (log2sql.py:180).
        val keyImage = if (bugCompatible && keyCols.nonEmpty) after else before
        s"UPDATE $schema SET ${setList(cols, after)}" +
          s" WHERE ${predicate(cols, keyImage, keyCols)} LIMIT 1;"
      case ("update", true) =>
        // after-image key is correct here: that's the row that exists
        // post-change (log2sql.py:152-160, verified in SURVEY.md §0)
        s"UPDATE $schema SET ${setList(cols, before)}" +
          s" WHERE ${predicate(cols, after, keyCols)} LIMIT 1;"
      case _ => null
    }
  }
}
