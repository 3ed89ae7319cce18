package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the binlog FSM: a random MODEL event sequence
  * is rendered to `mysqlbinlog -vv` text by an independent writer in
  * this spec, parsed by BinlogFsm, and the FULL parsed sequence —
  * op/db/table, every column ordinal and literal, both images,
  * positions — must equal the model, event for event. Seeds are fixed
  * (deterministic runs); the generator covers shapes the fixtures
  * sample only pointwise: random multi-row images, NULLs anywhere,
  * `=`/`;`/`>` inside string literals, negative numbers, optional
  * type annotations, backquoted and bare identifiers, junk lines
  * between events, DDL with and without `use` context.
  */
class BinlogFuzzSpec extends AnyFunSuite {

  private case class Img(cols: Seq[(Int, String)])
  private sealed trait MEv { def startPos: Long; def stopPos: Long }
  private case class Dml(op: String, db: String, table: String,
      images: Seq[(Option[Img], Option[Img])], // (before, after) per row
      startPos: Long, stopPos: Long) extends MEv
  private case class Ddl(use: Option[String], stmt: String,
      startPos: Long, stopPos: Long) extends MEv

  private def genValue(rnd: scala.util.Random): String = rnd.nextInt(5) match {
    case 0 => "NULL"
    case 1 => (rnd.nextInt(2000) - 1000).toString
    case 2 => s"${rnd.nextInt(200) - 100}.${rnd.nextInt(100)}"
    case 3 =>
      val chars = "abcXYZ019=_ ;>"
      val s = Seq.fill(1 + rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString
      // literals may contain '=' and spaces but the FSM's line-trim
      // must not be able to eat them: wrap in quotes as mysqlbinlog does
      s"'$s'"
    case _ => s"${rnd.nextInt(1 << 20)}"
  }

  private def genImg(rnd: scala.util.Random, nCols: Int): Img =
    Img((1 to nCols).map(k => k -> genValue(rnd)))

  private def genEvents(rnd: scala.util.Random, n: Int): Seq[MEv] = {
    val tables = Seq(("testdb", "t_pk", 3), ("appdb", "orders", 4),
      ("logdb", "audit", 2), ("db9", "wide", 5))
    var pos = 4L
    (0 until n).map { _ =>
      val start = pos
      val stop = pos + 50 + rnd.nextInt(400)
      pos = stop
      if (rnd.nextInt(8) == 0) {
        val use = if (rnd.nextBoolean()) Some(tables(rnd.nextInt(tables.size))._1) else None
        Ddl(use, s"alter table x_${rnd.nextInt(100)} add column c int", start, stop)
      } else {
        val (db, table, nCols) = tables(rnd.nextInt(tables.size))
        val op = Seq("insert", "update", "delete")(rnd.nextInt(3))
        val rows = 1 + rnd.nextInt(3)
        val images = (0 until rows).map { _ =>
          op match {
            case "insert" => (None, Some(genImg(rnd, nCols)))
            case "delete" => (Some(genImg(rnd, nCols)), None)
            case _ => (Some(genImg(rnd, nCols)), Some(genImg(rnd, nCols)))
          }
        }
        Dml(op, db, table, images, start, stop)
      }
    }
  }

  /** Independent writer: model → decode-rows text. Identifier quoting,
    * type annotations, and junk lines vary pseudo-randomly. */
  private def render(rnd: scala.util.Random, evs: Seq[MEv]): String = {
    val sb = new StringBuilder
    def cols(img: Img): Unit = img.cols.foreach { case (k, v) =>
      val ann = if (rnd.nextBoolean()) " /* SOMETYPE meta=1 nullable=1 is_null=0 */" else ""
      sb ++= s"###   @$k=$v$ann\n"
    }
    def q(id: String): String = if (rnd.nextBoolean()) s"`$id`" else id
    evs.foreach { ev =>
      if (rnd.nextInt(4) == 0) sb ++= "# stray comment the FSM must ignore\n"
      if (rnd.nextInt(6) == 0) sb ++= "BEGIN\n"
      sb ++= s"# at ${ev.startPos}\n"
      ev match {
        case Dml(op, db, table, images, _, stop) =>
          val kind = op match {
            case "insert" => "Write_rows"
            case "update" => "Update_rows"
            case _ => "Delete_rows"
          }
          sb ++= s"#260812  5:00:01 server id 1  end_log_pos $stop CRC32 0xfeed \t$kind: table id 42 flags: STMT_END_F\n"
          images.foreach { case (before, after) =>
            op match {
              case "insert" =>
                sb ++= s"### INSERT INTO ${q(db)}.${q(table)}\n### SET\n"
                cols(after.get)
              case "delete" =>
                sb ++= s"### DELETE FROM ${q(db)}.${q(table)}\n### WHERE\n"
                cols(before.get)
              case _ =>
                sb ++= s"### UPDATE ${q(db)}.${q(table)}\n### WHERE\n"
                cols(before.get)
                sb ++= "### SET\n"
                cols(after.get)
            }
          }
        case Ddl(use, stmt, _, stop) =>
          sb ++= s"#260812  5:00:02 server id 1  end_log_pos $stop CRC32 0xfeed \tQuery\tthread_id=7\texec_time=0\terror_code=0\n"
          use.foreach(u => sb ++= s"use `$u`/*!*/;\n")
          sb ++= s"SET TIMESTAMP=1764910800/*!*/;\n"
          sb ++= s"$stmt\n/*!*/;\n"
      }
    }
    sb.result()
  }

  private def checkSeed(seed: Long, n: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val evs = genEvents(rnd, n)
    val text = render(new scala.util.Random(seed + 1), evs)
    val parsed = BinlogFsm.parse("f", text.linesIterator, includeDdl = true).toList

    // expected flat sequence: one RawChange per row image, one per DDL
    val none = Seq.empty[(Int, String)]
    val expected = evs.flatMap {
      case Dml(op, db, table, images, start, stop) =>
        images.map { case (b, a) => (op, db, table,
          b.map(_.cols).getOrElse(none), a.map(_.cols).getOrElse(none), start, stop) }
      case Ddl(_, _, start, stop) =>
        Seq(("ddl", "", "", none, none, start, stop))
    }
    assert(parsed.size == expected.size, s"seed=$seed event count")
    parsed.zip(expected).zipWithIndex.foreach {
      case ((got, (op, db, table, before, after, start, stop)), i) =>
        assert(got.op == op && got.db == db && got.table == table,
          s"seed=$seed event $i header")
        assert(got.startPos == start && got.stopPos == stop,
          s"seed=$seed event $i positions")
        assert(got.beforeOrds.toSeq == before.map(_._1) &&
          got.beforeVals.toSeq == before.map(_._2), s"seed=$seed event $i before")
        assert(got.afterOrds.toSeq == after.map(_._1) &&
          got.afterVals.toSeq == after.map(_._2), s"seed=$seed event $i after")
    }
    // DDL text round-trips with `use` context and joined statement lines
    val ddls = parsed.filter(_.op == "ddl")
    val expDdl = evs.collect { case Ddl(use, stmt, _, _) =>
      (use.map(u => s"use `$u`;").toSeq :+ stmt).mkString("\n") + ";" }
    assert(ddls.map(_.ddl) == expDdl, s"seed=$seed ddl text")
  }

  test("random model corpora round-trip the FSM exactly (3 seeds x 300 events)") {
    for (seed <- Seq(11L, 4242L, 20260813L)) checkSeed(seed, 300)
  }

  test("truncated tail: a cut-off final image still yields a total parse") {
    val rnd = new scala.util.Random(77L)
    val evs = genEvents(rnd, 40)
    val text = render(new scala.util.Random(78L), evs)
    // cut mid-way through the last 10% of the text
    val cut = text.length - text.length / 10 + 3
    val parsed = BinlogFsm.parse("f", text.substring(0, cut).linesIterator).toList
    // never throws, and every fully-written event before the cut parses
    assert(parsed.nonEmpty && parsed.size <= evs.map {
      case d: Dml => d.images.size
      case _ => 0 // ddl excluded (includeDdl=false here)
    }.sum)
  }
}
