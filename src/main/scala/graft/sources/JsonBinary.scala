package graft.sources

/** MySQL binary JSON → JSON text. MYSQL_TYPE_JSON (245) row values
  * carry the server's in-table binary document format (public wire
  * format: MySQL internals "JSON binary format" / json_binary.h); an
  * 8.0 `mysqlbinlog -vv` parses it and prints the document text
  * (json_binary::parse_binary → Json_dom serialization), which is the
  * behavior [[BinlogBinary]] reproduces.
  *
  * Layout: one type byte, then the value. Containers hold
  * [count][size][key entries][value entries][keys][values] with u16
  * fields in the `small` variants and u32 in `large`; value entries
  * are (type u8, offset-or-inline) where literals and 16-bit ints
  * (and 32-bit ints in large containers) are stored inline in the
  * offset slot; offsets are relative to the container's data start.
  * Strings carry a 7-bit-groups varlen. Text rendering follows MySQL's
  * Json_dom: `{"k": v, …}` / `[v, …]` with ", "/": " separators,
  * JSON-escaped strings, bare numbers, `null`/`true`/`false`.
  * Doubles use Java's shortest-decimal (matches my_gcvt on the
  * common repertoire; scientific-notation corners can differ and are
  * excluded from fixtures).
  *
  * Failures throw IllegalArgumentException — [[BinlogBinary]]'s
  * containment wraps them with file/offset context.
  */
object JsonBinary {

  private val SmallObj = 0x00
  private val LargeObj = 0x01
  private val SmallArr = 0x02
  private val LargeArr = 0x03
  private val Lit = 0x04
  private val I16 = 0x05
  private val U16 = 0x06
  private val I32 = 0x07
  private val U32 = 0x08
  private val I64 = 0x09
  private val U64 = 0x0A
  private val Dbl = 0x0B
  private val Str = 0x0C
  private val Opaque = 0x0F

  def toText(doc: Array[Byte]): String = {
    // an empty value is how the server stores JSON `null` assignments
    // from some paths; render as the null literal
    if (doc.isEmpty) return "null"
    val sb = new java.lang.StringBuilder
    value(doc, doc(0) & 0xFF, 1, sb)
    sb.toString
  }

  /** Mutable document tree for partial-JSON diff application
    * (PARTIAL_UPDATE_ROWS_EVENT). Scalars keep their RENDERED text
    * (the exact bytes `toText` would emit — numbers, quoted strings,
    * literals, opaques), so a parse→render round trip of any document
    * is byte-identical to `toText` and an applied diff perturbs only
    * the edited node. Keys are stored RAW (unescaped) for path
    * matching and re-escaped on render. */
  sealed trait JNode
  final case class JObjN(
      fields: scala.collection.mutable.LinkedHashMap[String, JNode]) extends JNode
  final case class JArrN(
      items: scala.collection.mutable.ArrayBuffer[JNode]) extends JNode
  final case class JScalarN(text: String) extends JNode

  /** Binary JSON document → tree (same wire walk as [[toText]]). */
  def parseNode(doc: Array[Byte]): JNode = {
    if (doc.isEmpty) return JScalarN("null")
    node(doc, doc(0) & 0xFF, 1)
  }

  private def node(b: Array[Byte], tpe: Int, pos: Int): JNode = tpe match {
    case SmallObj | LargeObj | SmallArr | LargeArr =>
      val large = tpe == LargeObj || tpe == LargeArr
      val isObj = tpe == SmallObj || tpe == LargeObj
      val w = if (large) 4 else 2
      def field(p: Int): Int = if (large) u32(b, p).toInt else u16(b, p)
      val count = field(pos)
      val keyEntries = pos + 2 * w
      val valEntries = keyEntries + (if (isObj) count * (w + 2) else 0)
      def valueAt(i: Int): JNode = {
        val e = valEntries + i * (1 + w)
        val vType = b(e) & 0xFF
        if (inlined(vType, large)) node(b, vType, e + 1)
        else node(b, vType, pos + field(e + 1))
      }
      if (isObj) {
        val m = scala.collection.mutable.LinkedHashMap.empty[String, JNode]
        var i = 0
        while (i < count) {
          val keyOff = field(keyEntries + i * (w + 2))
          val keyLen = u16(b, keyEntries + i * (w + 2) + w)
          m.put(new String(b, pos + keyOff, keyLen, "UTF-8"), valueAt(i))
          i += 1
        }
        JObjN(m)
      } else {
        val a = scala.collection.mutable.ArrayBuffer.empty[JNode]
        var i = 0
        while (i < count) { a += valueAt(i); i += 1 }
        JArrN(a)
      }
    case scalar =>
      val sb = new java.lang.StringBuilder
      value(b, scalar, pos, sb)
      JScalarN(sb.toString)
  }

  /** Tree → text with [[toText]]'s exact conventions. */
  def renderNode(n: JNode): String = {
    val sb = new java.lang.StringBuilder
    renderTo(n, sb)
    sb.toString
  }

  private def renderTo(n: JNode, sb: java.lang.StringBuilder): Unit = n match {
    case JScalarN(t) => sb.append(t): Unit
    case JArrN(items) =>
      sb.append('[')
      var i = 0
      while (i < items.length) {
        if (i > 0) sb.append(", ")
        renderTo(items(i), sb)
        i += 1
      }
      sb.append(']'): Unit
    case JObjN(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, v) =>
        if (!first) sb.append(", ")
        first = false
        escapeStringTo(k, sb)
        sb.append(": ")
        renderTo(v, sb)
      }
      sb.append('}'): Unit
  }

  /** The [[appendJsonString]] escaping over an in-memory string. */
  private[sources] def escapeStringTo(s: String,
      sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"'): Unit
  }

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p).toLong | (u16(b, p + 2).toLong << 16)) & 0xFFFFFFFFL
  private def i64(b: Array[Byte], p: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }

  /** 7-bits-per-byte little-endian length with high-bit continuation
    * → (length, position after it). */
  private def varlen(b: Array[Byte], pos: Int): (Int, Int) = {
    var len = 0L; var p = pos; var shift = 0
    var cont = true
    while (cont) {
      val v = b(p) & 0xFF
      len |= (v & 0x7FL) << shift
      cont = (v & 0x80) != 0
      shift += 7; p += 1
    }
    (len.toInt, p)
  }

  /** Inline-in-the-offset-slot types (json_binary's inlined_type). */
  private def inlined(tpe: Int, large: Boolean): Boolean = tpe match {
    case Lit | I16 | U16 => true
    case I32 | U32 => large
    case _ => false
  }

  private def value(b: Array[Byte], tpe: Int, pos: Int,
      sb: java.lang.StringBuilder): Unit = tpe match {
    case SmallObj => container(b, pos, large = false, isObj = true, sb)
    case LargeObj => container(b, pos, large = true, isObj = true, sb)
    case SmallArr => container(b, pos, large = false, isObj = false, sb)
    case LargeArr => container(b, pos, large = true, isObj = false, sb)
    case Lit => sb.append((b(pos) & 0xFF) match {
      case 0 => "null"
      case 1 => "true"
      case 2 => "false"
      case v => throw new IllegalArgumentException(s"bad JSON literal $v")
    }): Unit
    case I16 => sb.append(u16(b, pos).toShort.toInt): Unit
    case U16 => sb.append(u16(b, pos)): Unit
    case I32 => sb.append(u32(b, pos).toInt): Unit
    case U32 => sb.append(u32(b, pos)): Unit
    case I64 => sb.append(i64(b, pos)): Unit
    case U64 => sb.append(java.lang.Long.toUnsignedString(i64(b, pos))): Unit
    case Dbl =>
      sb.append(java.lang.Double.toString(
        java.lang.Double.longBitsToDouble(i64(b, pos)))): Unit
    case Str =>
      val (len, p) = varlen(b, pos)
      appendJsonString(b, p, len, sb)
    case Opaque => opaque(b, pos, sb)
    case t => throw new IllegalArgumentException(
      f"unsupported JSON binary type 0x$t%02X")
  }

  /** JSONB_TYPE_OPAQUE (0x0F): [field_type u8][varlen len][data] — a
    * non-JSON MySQL value stored inside a document (json_binary.h's
    * opaque encoding). Rendering follows Json_dom:
    *  - DATE/TIME/DATETIME/TIMESTAMP carry the 8-byte LE *packed*
    *    temporal (TIME_to_longlong_*_packed: fractional micros in the
    *    low 24 bits, ymd<<17|hms above for datetimes, hms alone for
    *    times, sign by negation) and print as my_TIME_to_str with
    *    dec=6 — quoted, DATE without a fraction, TIME/DATETIME with
    *    exactly 6 fractional digits;
    *  - NEWDECIMAL carries [precision u8][scale u8][decimal binary]
    *    and prints as the bare decimal2string number;
    *  - every other field type prints as the quoted
    *    "base64:typeN:<base64 data>" string. */
  private def opaque(b: Array[Byte], pos: Int,
      sb: java.lang.StringBuilder): Unit = {
    val fieldType = b(pos) & 0xFF
    val (len, p) = varlen(b, pos + 1)
    def packedDatetime(): (Int, Int, Int, Int, Int, Int, Int) = {
      val a = math.abs(i64(b, p))
      val micros = (a & 0xFFFFFF).toInt
      val ymdhms = a >> 24
      val ymd = (ymdhms >> 17).toInt
      val hms = (ymdhms & 0x1FFFF).toInt
      val ym = ymd >> 5
      (ym / 13, ym % 13, ymd & 31,
        hms >> 12, (hms >> 6) & 0x3F, hms & 0x3F, micros)
    }
    fieldType match {
      case 10 => // MYSQL_TYPE_DATE
        val (y, mo, d, _, _, _, _) = packedDatetime()
        sb.append(f""""$y%04d-$mo%02d-$d%02d""""): Unit
      case 12 | 7 => // MYSQL_TYPE_DATETIME / MYSQL_TYPE_TIMESTAMP
        val (y, mo, d, h, mi, s, us) = packedDatetime()
        sb.append(
          f""""$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d.$us%06d""""): Unit
      case 11 => // MYSQL_TYPE_TIME
        val v = i64(b, p)
        val a = math.abs(v)
        val micros = (a & 0xFFFFFF).toInt
        val hms = (a >> 24).toInt
        val sign = if (v < 0) "-" else ""
        sb.append(f""""$sign%s${(hms >> 12) & 0x3FF}%02d:${(hms >> 6) & 0x3F}%02d:${hms & 0x3F}%02d.$micros%06d""""): Unit
      case 246 => // MYSQL_TYPE_NEWDECIMAL: [precision][scale][binary]
        val precision = b(p) & 0xFF
        val scale = b(p + 1) & 0xFF
        val sz = BinlogBinary.decimalBinSize(precision, scale)
        val raw = java.util.Arrays.copyOfRange(b, p + 2, p + 2 + sz)
        sb.append(BinlogBinary.decimalToString(raw, precision, scale)): Unit
      case ft =>
        sb.append('"').append("base64:type").append(ft).append(':')
          .append(java.util.Base64.getEncoder
            .encodeToString(java.util.Arrays.copyOfRange(b, p, p + len)))
          .append('"'): Unit
    }
  }

  private def container(b: Array[Byte], pos: Int, large: Boolean,
      isObj: Boolean, sb: java.lang.StringBuilder): Unit = {
    val w = if (large) 4 else 2
    def field(p: Int): Int =
      if (large) u32(b, p).toInt else u16(b, p)
    val count = field(pos)
    val keyEntries = pos + 2 * w // after count + size
    val valEntries = keyEntries + (if (isObj) count * (w + 2) else 0)
    sb.append(if (isObj) '{' else '[')
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(", ")
      if (isObj) {
        val keyOff = field(keyEntries + i * (w + 2))
        val keyLen = u16(b, keyEntries + i * (w + 2) + w)
        appendJsonString(b, pos + keyOff, keyLen, sb)
        sb.append(": ")
      }
      val e = valEntries + i * (1 + w)
      val vType = b(e) & 0xFF
      if (inlined(vType, large)) value(b, vType, e + 1, sb)
      else value(b, vType, pos + field(e + 1), sb)
      i += 1
    }
    sb.append(if (isObj) '}' else ']'): Unit
  }

  /** JSON string serialization (Json_dom style): double-quoted, with
    * `"` `\` and control chars escaped (named escapes where JSON has
    * them, `\u00NN` otherwise). */
  private def appendJsonString(b: Array[Byte], pos: Int, len: Int,
      sb: java.lang.StringBuilder): Unit =
    escapeStringTo(new String(b, pos, len, "UTF-8"), sb)
}
