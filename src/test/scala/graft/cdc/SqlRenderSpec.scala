package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Render semantics: golden statements from FIXTURES.md §4 (generated
  * from executed reference behavior), the key-selection matrix
  * (pk / unique-fallback / keyless), and the Q3 fix/bug-compat split. */
class SqlRenderSpec extends AnyFunSuite {

  private val cols = Seq(1 -> "id", 2 -> "name", 3 -> "score")
  private val pk = Seq("id")

  private def r(op: String, before: Seq[ColVal], after: Seq[ColVal],
      keys: Seq[String] = pk, flashback: Boolean = false,
      bug: Boolean = false): String =
    SqlRender.render(op, "testdb", "t_pk", before, after, null,
      cols, keys, flashback, bug)

  private val insAfter = Seq(ColVal(1, "7"), ColVal(2, "'name_7'"), ColVal(3, "NULL"))
  private val updBefore = Seq(ColVal(1, "7"), ColVal(2, "'name_7'"), ColVal(3, "NULL"))
  private val updAfter = Seq(ColVal(1, "7"), ColVal(2, "'renamed_7'"), ColVal(3, "3.5"))

  test("forward insert (golden)") {
    assert(r("insert", Nil, insAfter) ==
      "INSERT INTO `testdb`.`t_pk`(`id`, `name`, `score`) VALUES (7, 'name_7', NULL);")
  }

  test("forward update keyed (golden)") {
    assert(r("update", updBefore, updAfter) ==
      "UPDATE `testdb`.`t_pk` SET `id`=7, `name`='renamed_7', `score`=3.5 WHERE `id`=7 LIMIT 1;")
  }

  test("forward delete keyed (golden)") {
    assert(r("delete", updAfter, Nil) ==
      "DELETE FROM `testdb`.`t_pk` WHERE `id`=7 LIMIT 1;")
  }

  test("flashback insert -> DELETE by key") {
    assert(r("insert", Nil, insAfter, flashback = true) ==
      "DELETE FROM `testdb`.`t_pk` WHERE `id`=7 LIMIT 1;")
  }

  test("flashback delete -> INSERT full row") {
    assert(r("delete", updAfter, Nil, flashback = true) ==
      "INSERT INTO `testdb`.`t_pk`(`id`, `name`, `score`) VALUES (7, 'renamed_7', 3.5);")
  }

  test("flashback update -> inverse UPDATE, after-image key") {
    assert(r("update", updBefore, updAfter, flashback = true) ==
      "UPDATE `testdb`.`t_pk` SET `id`=7, `name`='name_7', `score`=NULL WHERE `id`=7 LIMIT 1;")
  }

  test("keyless: WHERE lists all columns with IS NULL handling (Q1/O25)") {
    assert(r("delete", updBefore, Nil, keys = Nil) ==
      "DELETE FROM `testdb`.`t_pk` WHERE `id`=7 AND `name`='name_7' AND `score` IS NULL LIMIT 1;")
  }

  test("keyless forward update: WHERE = full before image") {
    assert(r("update", updBefore, updAfter, keys = Nil) ==
      "UPDATE `testdb`.`t_pk` SET `id`=7, `name`='renamed_7', `score`=3.5" +
        " WHERE `id`=7 AND `name`='name_7' AND `score` IS NULL LIMIT 1;")
  }

  test("unique-index fallback keys the WHERE") {
    val ucols = Seq(1 -> "id", 2 -> "code", 3 -> "val")
    val got = SqlRender.render("delete",
      "testdb", "t_uniq", Seq(ColVal(1, "1"), ColVal(2, "'c1'"), ColVal(3, "10")),
      Nil, null, ucols, Seq("code"), flashback = false, bugCompatible = false)
    assert(got == "DELETE FROM `testdb`.`t_uniq` WHERE `code`='c1' LIMIT 1;")
  }

  test("PK-changing update: engine keys forward WHERE on before image (Q3 fixed)") {
    val b = Seq(ColVal(1, "1"), ColVal(2, "'one'"), ColVal(3, "1.0"))
    val a = Seq(ColVal(1, "9"), ColVal(2, "'nine'"), ColVal(3, "9.0"))
    assert(r("update", b, a) ==
      "UPDATE `testdb`.`t_pk` SET `id`=9, `name`='nine', `score`=9.0 WHERE `id`=1 LIMIT 1;")
    // reference behavior (verified by execution, SURVEY.md §2.2 Q3):
    // index_info overwritten by the after image
    assert(r("update", b, a, bug = true) ==
      "UPDATE `testdb`.`t_pk` SET `id`=9, `name`='nine', `score`=9.0 WHERE `id`=9 LIMIT 1;")
    // flashback keys on after image — correct in both modes
    assert(r("update", b, a, flashback = true) ==
      "UPDATE `testdb`.`t_pk` SET `id`=1, `name`='one', `score`=1.0 WHERE `id`=9 LIMIT 1;")
  }

  test("noPk strips key columns from INSERTs only (Q5 implemented)") {
    val got = SqlRender.render("insert", "testdb", "t_pk", Nil, insAfter,
      null, cols, pk, flashback = false, bugCompatible = false, noPk = true)
    assert(got == "INSERT INTO `testdb`.`t_pk`(`name`, `score`) VALUES ('name_7', NULL);")
    // WHERE clauses keep the key
    val del = SqlRender.render("delete", "testdb", "t_pk", updAfter, Nil,
      null, cols, pk, flashback = false, bugCompatible = false, noPk = true)
    assert(del == "DELETE FROM `testdb`.`t_pk` WHERE `id`=7 LIMIT 1;")
  }

  test("unknown table (no catalog row): ordinals as @N names, keyless") {
    val got = SqlRender.render("insert", "x", "y", Nil,
      Seq(ColVal(1, "1")), null, Nil, Nil, flashback = false, bugCompatible = false)
    assert(got == "INSERT INTO `x`.`y`(`@1`) VALUES (1);")
  }

  test("forward-then-flashback inversion property on the fixture stream") {
    // Interpret rendered SQL against an in-memory table keyed by id.
    // Applying the forward stream then the flashback stream in reverse
    // must restore the initial state (the semantic spec of O19–O24).
    val evs = BinlogFsm.parse("f", BinlogFixture.dmlStream(3000).linesIterator).toList
    type Row = Map[String, String]
    val colsM = Map(1 -> "id", 2 -> "name", 3 -> "score")
    def toRow(img: Seq[ColVal]): Row = img.map(cv => colsM(cv.ord) -> cv.v).toMap

    // seed: rows that get updated/deleted must exist first
    val seed: Map[String, Row] = evs.collect {
      case e if e.op == "update" => e.before
      case e if e.op == "delete" => e.before
    }.map(img => toRow(img)("id") -> toRow(img)).toMap

    def applyFwd(state: Map[String, Row], e: RawChange): Map[String, Row] = e.op match {
      case "insert" => val r = toRow(e.after); state + (r("id") -> r)
      case "delete" => state - toRow(e.before)("id")
      case "update" =>
        val b = toRow(e.before); val a = toRow(e.after)
        (state - b("id")) + (a("id") -> a)
    }
    def applyFlashback(state: Map[String, Row], e: RawChange): Map[String, Row] = e.op match {
      case "insert" => state - toRow(e.after)("id")
      case "delete" => val r = toRow(e.before); state + (r("id") -> r)
      case "update" =>
        val b = toRow(e.before); val a = toRow(e.after)
        (state - a("id")) + (b("id") -> b)
    }
    val after = evs.foldLeft(seed)(applyFwd)
    val restored = evs.reverse.foldLeft(after)(applyFlashback)
    assert(restored == seed)
  }
}
