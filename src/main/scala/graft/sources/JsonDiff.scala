package graft.sources

import JsonBinary.{JNode, JObjN, JArrN}

/** Partial-JSON diff application (MySQL 8.0 `binlog_row_value_options=
  * PARTIAL_JSON`): a PARTIAL_UPDATE_ROWS_EVENT ships each modified
  * JSON column as a sequence of (operation, path, value) diffs instead
  * of the full document (public format: sql/json_diff.h
  * `enum_json_diff_operation` and WL#2955; the server applies them in
  * `apply_json_diffs`). The engine's binary decoder APPLIES the diffs
  * against the before-image document and emits the complete after
  * image, so every downstream consumer (render, state materialization,
  * envelopes) sees partial and full-image streams identically.
  *
  * Operations: 0 REPLACE (path must exist), 1 INSERT (new object
  * member, or array insert-at-index shifting right / appending past
  * the end), 2 REMOVE (delete the member/element). Paths are the
  * server's Json_path text: `$`, `.member` (bare or double-quoted),
  * `[N]` — the subset the server ever emits in diffs (no wildcards or
  * ranges: a diff addresses exactly one node).
  *
  * Failures throw IllegalArgumentException (a diff that does not
  * apply means a corrupt or mis-ordered stream — the server errors
  * with ER_COULD_NOT_APPLY_JSON_DIFF the same way); BinlogBinary's
  * containment wraps them with file/offset context.
  */
object JsonDiff {

  val Replace = 0
  val Insert = 1
  val Remove = 2

  sealed trait Leg
  final case class Member(name: String) extends Leg
  final case class Elem(i: Int) extends Leg

  /** `$`, then `.name` / `."quoted name"` / `[N]` legs. */
  def parsePath(p: String): Seq[Leg] = {
    if (p.isEmpty || p.charAt(0) != '$')
      throw new IllegalArgumentException(s"JSON path must start at $$: '$p'")
    val legs = Seq.newBuilder[Leg]
    var i = 1
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          i += 1
          if (i < p.length && p.charAt(i) == '"') {
            val sb = new java.lang.StringBuilder
            i += 1
            while (i < p.length && p.charAt(i) != '"') {
              if (p.charAt(i) == '\\' && i + 1 < p.length) i += 1
              sb.append(p.charAt(i)); i += 1
            }
            if (i >= p.length) throw new IllegalArgumentException(
              s"unterminated quoted member in path '$p'")
            i += 1 // closing quote
            legs += Member(sb.toString)
          } else {
            val start = i
            while (i < p.length && p.charAt(i) != '.' && p.charAt(i) != '[') i += 1
            if (i == start) throw new IllegalArgumentException(
              s"empty member name in path '$p'")
            legs += Member(p.substring(start, i))
          }
        case '[' =>
          val start = i + 1
          i = p.indexOf(']', start)
          if (i < 0) throw new IllegalArgumentException(
            s"unterminated [index] in path '$p'")
          legs += Elem(Integer.parseInt(p.substring(start, i)))
          i += 1
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' at $i in path '$p'")
      }
    }
    legs.result()
  }

  /** Apply one diff; mutates containers in place, returns the (possibly
    * new) root — a REPLACE at `$` swaps the whole document. */
  def apply(root: JNode, op: Int, path: String, value: Option[JNode]): JNode = {
    val legs = parsePath(path)
    if (legs.isEmpty) {
      if (op != Replace) throw new IllegalArgumentException(
        s"only REPLACE applies at the root path (op=$op)")
      return value.getOrElse(throw new IllegalArgumentException(
        "REPLACE diff with no value"))
    }
    val parent = legs.dropRight(1).foldLeft(root) { (n, leg) =>
      step(n, leg, path)
    }
    (parent, legs.last, op) match {
      case (JObjN(fields), Member(name), Replace) =>
        if (!fields.contains(name)) throw new IllegalArgumentException(
          s"REPLACE path '$path': member not present")
        fields.put(name, reqValue(op, value)): Unit
      case (JObjN(fields), Member(name), Insert) =>
        // server semantics: INSERT of an existing member is a no-op
        // diff the server never emits; treat as corrupt
        if (fields.contains(name)) throw new IllegalArgumentException(
          s"INSERT path '$path': member already present")
        fields.put(name, reqValue(op, value)): Unit
      case (JObjN(fields), Member(name), Remove) =>
        if (fields.remove(name).isEmpty) throw new IllegalArgumentException(
          s"REMOVE path '$path': member not present")
      case (JArrN(items), Elem(i), Replace) =>
        if (i < 0 || i >= items.length) throw new IllegalArgumentException(
          s"REPLACE path '$path': index out of range (${items.length})")
        items(i) = reqValue(op, value)
      case (JArrN(items), Elem(i), Insert) =>
        if (i < 0) throw new IllegalArgumentException(
          s"INSERT path '$path': negative index")
        if (i >= items.length) items += reqValue(op, value)
        else items.insert(i, reqValue(op, value))
      case (JArrN(items), Elem(i), Remove) =>
        if (i < 0 || i >= items.length) throw new IllegalArgumentException(
          s"REMOVE path '$path': index out of range (${items.length})")
        items.remove(i): Unit
      case (_, leg, _) => throw new IllegalArgumentException(
        s"path '$path': $leg does not address into ${parent.getClass.getSimpleName}")
    }
    root
  }

  private def reqValue(op: Int, value: Option[JNode]): JNode =
    value.getOrElse(throw new IllegalArgumentException(
      s"diff op $op requires a value"))

  private def step(n: JNode, leg: Leg, path: String): JNode = (n, leg) match {
    case (JObjN(fields), Member(name)) =>
      fields.getOrElse(name, throw new IllegalArgumentException(
        s"path '$path': member '$name' not present"))
    case (JArrN(items), Elem(i)) =>
      if (i < 0 || i >= items.length) throw new IllegalArgumentException(
        s"path '$path': index $i out of range (${items.length})")
      items(i)
    case (other, l) => throw new IllegalArgumentException(
      s"path '$path': $l does not address into ${other.getClass.getSimpleName}")
  }
}
