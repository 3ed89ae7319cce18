package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The json_int scanner must agree with a full JSON parse on every
  * shape it claims to handle, and return NULL (never a wrong value)
  * on everything else. */
class JsonIntGetSpec extends AnyFunSuite {

  private def x(json: String, key: String = "k"): java.lang.Long =
    JsonFastPath.extract(json, key)

  test("flat objects: present, absent, later position, whitespace") {
    assert(x("""{"k": 76}""") == 76L)
    assert(x("""{"k":0}""") == 0L)
    assert(x("""{"k":-42}""") == -42L)
    assert(x("""{"a":1,"k":2,"z":3}""") == 2L)
    assert(x("""  { "a" : 1 , "k" : 9 } """) == 9L)
    assert(x("""{"a":1}""") == null) // absent
    assert(x("""{}""") == null)
  }

  test("a matching key inside a STRING VALUE never matches") {
    assert(x("""{"a":"\"k\":123","k":7}""") == 7L)
    assert(x("""{"a":"k","k":5}""") == 5L)
    assert(x("""{"a":"{\"k\":1}","k":6}""") == 6L)
    // escape-aware string skipping: backslash before quote
    assert(x("""{"a":"x\\","k":8}""") == 8L)
  }

  test("nested containers are skipped structurally, not matched") {
    assert(x("""{"o":{"k":1},"k":2}""") == 2L)
    assert(x("""{"o":{"k":1}}""") == null) // only TOP-LEVEL keys match
    assert(x("""{"arr":[1,{"k":3},"k"],"k":4}""") == 4L)
    assert(x("""{"o":{"s":"}"},"k":5}""") == 5L) // brace inside nested string
  }

  test("non-integer values yield NULL, not a truncated number") {
    assert(x("""{"k":1.5}""") == null)
    assert(x("""{"k":1e3}""") == null)
    assert(x("""{"k":"12"}""") == null)
    assert(x("""{"k":true}""") == null)
    assert(x("""{"k":null}""") == null)
    assert(x("""{"k":[1]}""") == null)
    assert(x("""{"k":{}}""") == null)
  }

  test("malformed input and overflow yield NULL") {
    assert(x("""""") == null)
    assert(x("""[1,2]""") == null)
    assert(x(""""k"""") == null)
    assert(x("""{"k" 1}""") == null)
    assert(x("""{"k":12junk}""") == null)
    assert(x("""{"k":99999999999999999999}""") == null) // > Long.Max
    assert(x("""{"k":9223372036854775807}""") == Long.MaxValue)
    assert(x("""{"unterminated""") == null)
  }

  test("longer / multi-field objects and long values") {
    assert(x("""{"user":"bob","n":3,"k":1234567890123}""") == 1234567890123L)
    assert(x("""{"k1":1,"k":2,"kk":3}""") == 2L)
    assert(x("""{"kk":3,"k1":1}""") == null) // prefixes must not match
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("SQL + Column surface matches from_json over a generated corpus") {
    import spark.implicits._
    JsonIntGet.register(spark)
    val rows = (0 until 1000).map { i =>
      if (i % 7 == 0) s"""{"pad":"v$i","k":${i * 37 - 5000}}"""
      else if (i % 11 == 0) s"""{"k":1.5,"x":$i}"""
      else if (i % 13 == 0) s"""{"x":$i}"""
      else s"""{"k": ${i % 100}}"""
    }.toDF("props")
    val viaScanner = rows.selectExpr("json_int(props, 'k') AS k")
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val viaJackson = rows.selectExpr("from_json(props, 'k BIGINT').k AS k")
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    // from_json reads 1.5 as a truncating cast? No — k BIGINT on a
    // fraction yields null in FAILFAST-less mode; both sides must agree
    assert(viaScanner.toSeq == viaJackson.toSeq)
  }
}
