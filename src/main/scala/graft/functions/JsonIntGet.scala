package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass scanner extracting ONE top-level integer field from a
  * JSON object string — the `json_int(json, 'key')` fast path.
  *
  * `get_json_object`/`from_json` funnel every row through a full
  * Jackson parse; for the pervasive telemetry shape (a small flat
  * object probed for one scalar) a simdjson-style single-field scan is
  * an order of magnitude cheaper and allocation-free. This is the
  * same operator DuckDB's native JSON_EXTRACT fast path provides.
  *
  * Semantics: returns NULL when the key is absent, its value is not a
  * JSON integer (string/float/object/array/bool/null), or the input is
  * not a JSON object. String values and nested containers are skipped
  * structurally (escape-aware), so a `"key"` occurring inside some
  * other string value never matches. Matching compares the RAW key
  * span — a key that needs JSON escaping (quotes, backslashes,
  * control chars) won't match; use `from_json` for those.
  */
object JsonFastPath {

  def extractLong(json: UTF8String, key: UTF8String): java.lang.Long =
    if (json == null || key == null) null
    else extract(json.toString, key.toString)

  def extract(s: String, key: String): java.lang.Long = {
    val n = s.length
    var i = skipWs(s, 0)
    if (i >= n || s.charAt(i) != '{') return null
    i += 1
    var first = true
    while (true) {
      i = skipWs(s, i)
      if (i >= n) return null
      if (s.charAt(i) == '}') return null // key absent
      if (!first) {
        if (s.charAt(i) != ',') return null
        i = skipWs(s, i + 1)
        if (i >= n) return null
      }
      first = false
      if (s.charAt(i) != '"') return null
      val keyStart = i + 1
      val keyEnd = stringEnd(s, keyStart) // index of closing quote
      if (keyEnd < 0) return null
      val hit = keyMatches(s, keyStart, keyEnd, key)
      i = skipWs(s, keyEnd + 1)
      if (i >= n || s.charAt(i) != ':') return null
      i = skipWs(s, i + 1)
      if (i >= n) return null
      if (hit) return parseIntValue(s, i)
      i = skipValue(s, i)
      if (i < 0) return null
    }
    null // unreachable
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** Index of the closing quote of the string starting (after its
    * opening quote) at `from`, honoring backslash escapes; -1 if
    * unterminated. */
  private def stringEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i
      else i += 1
    }
    -1
  }

  /** Raw-span key equality: no unescaping (an escaped key never
    * matches — documented). */
  private def keyMatches(s: String, start: Int, end: Int, key: String): Boolean = {
    if (end - start != key.length) return false
    var i = 0
    while (i < key.length) {
      if (s.charAt(start + i) != key.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Parse a JSON integer at `i`; null if the value there is anything
    * else (fraction/exponent included). */
  private def parseIntValue(s: String, from: Int): java.lang.Long = {
    var i = from
    val n = s.length
    var neg = false
    if (i < n && s.charAt(i) == '-') { neg = true; i += 1 }
    if (i >= n || s.charAt(i) < '0' || s.charAt(i) > '9') return null
    var v = 0L
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
      val d = s.charAt(i) - '0'
      if (v > (Long.MaxValue - d) / 10) return null // overflow → not representable
      v = v * 10 + d
      i += 1
    }
    if (i < n) {
      val c = s.charAt(i)
      // 1.5 / 1e3 are JSON numbers but not integers
      if (c == '.' || c == 'e' || c == 'E') return null
      // a valid object continues with ws , or } — anything else is junk
      if (c != ' ' && c != '\t' && c != '\n' && c != '\r' && c != ',' && c != '}')
        return null
    }
    java.lang.Long.valueOf(if (neg) -v else v)
  }

  /** Skip one JSON value starting at `i` (string, number, literal,
    * or balanced object/array with escape-aware string skipping);
    * returns the index just past it, or -1 on malformed input. */
  private def skipValue(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    if (i >= n) return -1
    s.charAt(i) match {
      case '"' =>
        val e = stringEnd(s, i + 1)
        if (e < 0) -1 else e + 1
      case '{' | '[' =>
        var depth = 0
        while (i < n) {
          val c = s.charAt(i)
          if (c == '"') {
            val e = stringEnd(s, i + 1)
            if (e < 0) return -1
            i = e + 1
          } else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') { depth -= 1; if (depth == 0) return i + 1 }
            i += 1
          }
        }
        -1
      case _ =>
        // number / true / false / null: run to the next delimiter
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != '}' &&
          s.charAt(i) != ']' && s.charAt(i) != ' ' && s.charAt(i) != '\t' &&
          s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
        if (i == from) -1 else i
    }
  }
}

/** Catalyst expression for `json_int(json, key)` — codegen'd call into
  * the scanner above; the key is typically a literal but any string
  * expression works. */
case class JsonIntGet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_int expects (STRING json, STRING key), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(j: Any, k: Any): Any =
    JsonFastPath.extractLong(j.asInstanceOf[UTF8String], k.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, k) => {
      val v = ctx.freshName("jsonInt")
      s"""
         |java.lang.Long $v = graft.functions.JsonFastPath.extractLong($j, $k);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JsonIntGet {
  /** Idempotent per-session SQL + Column registration (same pattern as
    * CosineSim.register). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("json_int"))) return
    reg.createOrReplaceTempFunction(
      "json_int", exprs => {
        if (exprs.length != 2) throw new org.apache.spark.sql.AnalysisException(
          s"json_int expects exactly 2 arguments, got ${exprs.length}",
          None, None, None, None, Map.empty,
          Array.empty[org.apache.spark.QueryContext])
        JsonIntGet(exprs(0), exprs(1))
      }, "built-in")
  }

  /** Column API via the registered name (register(spark) first). */
  def json_int(j: Column, key: Column): Column =
    org.apache.spark.sql.functions.call_function("json_int", j, key)
}
