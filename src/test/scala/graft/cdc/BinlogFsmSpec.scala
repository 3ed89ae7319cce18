package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** FSM unit tests — pure Scala, no SparkSession. Grammar facts and
  * expected values from FIXTURES.md §2 / reference behavior
  * (/root/reference/log2sql.py:93-107). */
class BinlogFsmSpec extends AnyFunSuite {

  private def parse(text: String, ddl: Boolean = false): List[RawChange] =
    BinlogFsm.parse("f1", text.linesIterator, ddl).toList

  test("representative stream: three DML events with positions") {
    val evs = parse(BinlogFixture.representative)
    assert(evs.map(_.op) == List("insert", "update", "delete"))
    assert(evs.map(_.startPos) == List(100L, 200L, 320L))
    assert(evs.map(_.stopPos) == List(200L, 320L, 400L))
    assert(evs.forall(e => e.db == "testdb" && e.table == "t_pk"))
  }

  test("insert carries values in after; literal strings verbatim") {
    val ins = parse(BinlogFixture.representative).head
    assert(ins.before.isEmpty)
    assert(ins.after == List(ColVal(1, "7"), ColVal(2, "'name_7'"), ColVal(3, "NULL")))
  }

  test("update splits WHERE image into before, SET image into after") {
    val up = parse(BinlogFixture.representative)(1)
    assert(up.before == List(ColVal(1, "7"), ColVal(2, "'name_7'"), ColVal(3, "NULL")))
    assert(up.after == List(ColVal(1, "7"), ColVal(2, "'renamed_7'"), ColVal(3, "3.5")))
  }

  test("delete carries values in before") {
    val del = parse(BinlogFixture.representative)(2)
    assert(del.after.isEmpty)
    assert(del.before == List(ColVal(1, "7"), ColVal(2, "'renamed_7'"), ColVal(3, "3.5")))
  }

  test("pos comment is reference-verbatim including spacing") {
    val ins = parse(BinlogFixture.representative).head
    assert(ins.posComment ==
      "# start-pos: 100; stop-pos: 200 ; datetime: 260812  5:00:00 ")
  }

  test("DDL ignored by default, parsed with includeDdl") {
    assert(!parse(BinlogFixture.representative).exists(_.op == "ddl"))
    val ddl = parse(BinlogFixture.representative, ddl = true)
      .filter(_.op == "ddl")
    assert(ddl.map(_.ddl) ==
      List("use `testdb`;\nalter table t_pk add column extra int;"))
  }

  test("ddlOnly fast path: same DDL events, zero DML work") {
    val full = parse(BinlogFixture.representative, ddl = true)
    val fast = BinlogFsm.parse("f1",
      BinlogFixture.representative.linesIterator,
      includeDdl = true, ddlOnly = true).toList
    assert(fast.forall(_.op == "ddl"))
    // same DDL text + positions as the full parse (seq may differ:
    // ddlOnly counts only DDL, which is safe for the timeline fold —
    // pruned files contribute no row events to order against)
    assert(fast.map(e => (e.ddl, e.startPos)) ==
      full.filter(_.op == "ddl").map(e => (e.ddl, e.startPos)))
  }

  test("PK-changing update keeps both images distinct (quirk Q3 input)") {
    val up = parse(BinlogFixture.pkChangingUpdate).head
    assert(up.before.head == ColVal(1, "1"))
    assert(up.after.head == ColVal(1, "9"))
  }

  test("multi-row event: each row header is its own change, same pos") {
    val text =
      """# at 10
        |#260812  6:00:00 server id 1  end_log_pos 99 CRC32 0xdead 	Write_rows: table id 1 flags: STMT_END_F
        |### INSERT INTO `testdb`.`t_pk`
        |### SET
        |###   @1=1
        |### INSERT INTO `testdb`.`t_pk`
        |### SET
        |###   @1=2
        |""".stripMargin
    val evs = parse(text)
    assert(evs.size == 2)
    assert(evs.map(_.after) == List(List(ColVal(1, "1")), List(ColVal(1, "2"))))
    assert(evs.map(_.startPos) == List(10L, 10L))
  }

  test("totality: truncated tail yields the partial row, never throws") {
    val whole = BinlogFixture.representative
    for (cut <- Seq(40, 150, 300, whole.length - 5)) {
      val evs = parse(whole.take(cut)) // must not throw
      assert(evs.forall(e => Set("insert", "update", "delete")(e.op)))
    }
  }

  test("garbage and empty input are ignored") {
    assert(parse("").isEmpty)
    assert(parse("random line\n### @@@weird\n# at x\n").isEmpty)
  }

  test("value containing '=' survives (reference splits every '=')") {
    val text =
      """# at 10
        |#260812  6:00:00 server id 1  end_log_pos 99 CRC32 0xdead 	Write_rows: t
        |### INSERT INTO `testdb`.`t_pk`
        |### SET
        |###   @1='a=b'
        |""".stripMargin
    assert(parse(text).head.after == List(ColVal(1, "'a=b'")))
  }

  test("dmlStream generator: n events, 1:1:1 mix") {
    val evs = parse(BinlogFixture.dmlStream(300))
    assert(evs.size == 300)
    assert(evs.count(_.op == "insert") == 100)
    assert(evs.count(_.op == "update") == 100)
    assert(evs.count(_.op == "delete") == 100)
    assert(evs.map(_.startPos) == evs.map(_.startPos).sorted)
  }
}
