package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** The c8 adversarial corpus (BinlogFixture.stressStream) against the
  * FSM: parse counts must equal the generator's composition derived
  * WITHOUT text (same modular arithmetic, no parsing), and each
  * hostile shape — multi-row events, `=`-bearing literals, PK-changing
  * key images, NULL transitions — must survive individually. Pure
  * FSM-level tests (no Spark session): the driver-visible twin is the
  * `c8_stress_parse_counts` oracle entry.
  */
class CdcStressSpec extends AnyFunSuite {

  private def parsed(n: Int, ddl: Boolean = false): List[RawChange] =
    BinlogFsm.parse("f", BinlogFixture.stressStream(n).linesIterator,
      includeDdl = ddl).toList

  test("stress corpus: FSM counts equal the generator composition") {
    val n = 1500
    val got = parsed(n, ddl = true)
      .groupBy(e => (e.db, e.table, e.op))
      .view.mapValues(_.size.toLong).toMap
    assert(got == BinlogFixture.stressComposition(n))
  }

  test("excluding DDL drops exactly the DDL slots") {
    val n = 400
    val withDdl = parsed(n, ddl = true)
    val without = parsed(n)
    assert(withDdl.count(_.op == "ddl") == (n + 12) / 13)
    assert(without.size == withDdl.size - (n + 12) / 13)
    assert(without.forall(_.op != "ddl"))
  }

  test("multi-row events emit one change per row image, sharing the position window") {
    val multi = parsed(100).filter(e => e.op == "insert" && e.table == "t_pk")
    val byPos = multi.groupBy(_.startPos)
    assert(byPos.nonEmpty)
    assert(byPos.values.forall(_.size == 3),
      "each Write_rows header carries exactly 3 row images")
    // images are distinct rows, not one row repeated
    assert(multi.map(_.afterVals(0)).distinct.size == multi.size)
  }

  test("literals containing '=' survive the first-'=' split") {
    val audit = parsed(50).find(e => e.table == "audit" && e.op == "insert").get
    assert(audit.afterVals.contains("'k=v; retry>=3; src=binlog'"))
    val del = parsed(50).find(e => e.table == "audit" && e.op == "delete").get
    assert(del.beforeVals.contains("'evt=purge level=3 note=a=b'"))
  }

  test("PK-changing updates carry distinct before/after key images") {
    val ups = parsed(200).filter(e => e.table == "t_multi" && e.op == "update")
    assert(ups.nonEmpty)
    assert(ups.forall(u => u.beforeVals(0) != u.afterVals(0)))
  }

  test("NULL transitions: value->NULL and NULL->value updates parse as literal NULL") {
    val ups = parsed(200).filter(e => e.table == "orders" && e.op == "update")
    assert(ups.nonEmpty)
    // @2 always goes value -> NULL; @3 alternates NULL -> 'paid=true'
    assert(ups.forall(u => u.beforeVals(1) != "NULL" && u.afterVals(1) == "NULL"))
    assert(ups.exists(u => u.beforeVals(2) == "NULL" && u.afterVals(2) == "'paid=true'"))
  }
}
