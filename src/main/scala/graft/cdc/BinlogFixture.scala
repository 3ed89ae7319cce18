package graft.cdc

import scala.collection.mutable

/** Deterministic synthetic `mysqlbinlog -vv --base64-output=decode-rows`
  * text (dialect per FIXTURES.md §2, grammar per
  * /root/reference/log2sql.py:93-107). Used by the FSM/render specs,
  * the c-series query entries, and the CDC throughput bench — the same
  * 1:1:1 insert/update/delete mix over a 3-column PK table as
  * BASELINE.md §1.
  */
object BinlogFixture {

  /** `n` DML events against testdb.t_pk. Event i: i%3==0 insert,
    * 1 update, 2 delete. */
  def dmlStream(n: Int): String = {
    val sb = new StringBuilder(n * 360)
    var pos = 100L
    var t = 0L
    def header(kind: String, stop: Long): Unit = {
      sb ++= s"# at $pos\n"
      sb ++= f"#260812 ${5 + t / 3600}%2d:${(t / 60) % 60}%02d:${t % 60}%02d server id 1  end_log_pos $stop CRC32 0x1a2b3c4d \t$kind: table id 108 flags: STMT_END_F\n"
      t += 1
    }
    for (i <- 0 until n) {
      val stop = pos + 120
      header(i % 3 match {
        case 0 => "Write_rows"; case 1 => "Update_rows"; case _ => "Delete_rows"
      }, stop)
      i % 3 match {
        case 0 =>
          sb ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
          sb ++= s"###   @1=$i /* INT meta=0 nullable=0 is_null=0 */\n"
          sb ++= s"###   @2='name_$i' /* VARSTRING(160) meta=160 nullable=1 is_null=0 */\n"
          sb ++= s"###   @3=${if (i % 7 == 0) "NULL" else (i % 100).toString + ".5"} /* DOUBLE meta=8 nullable=1 is_null=${if (i % 7 == 0) 1 else 0} */\n"
        case 1 =>
          sb ++= "### UPDATE `testdb`.`t_pk`\n### WHERE\n"
          sb ++= s"###   @1=$i /* INT */\n###   @2='name_$i' /* VARSTRING(160) */\n###   @3=1.5 /* DOUBLE */\n"
          sb ++= "### SET\n"
          sb ++= s"###   @1=$i /* INT */\n###   @2='renamed_$i' /* VARSTRING(160) */\n###   @3=2.5 /* DOUBLE */\n"
        case _ =>
          sb ++= "### DELETE FROM `testdb`.`t_pk`\n### WHERE\n"
          sb ++= s"###   @1=$i /* INT */\n###   @2='renamed_$i' /* VARSTRING(160) */\n###   @3=2.5 /* DOUBLE */\n"
      }
      pos = stop
    }
    sb.result()
  }

  /** The FIXTURES.md §2 representative block verbatim: insert → update
    * → delete on t_pk, then a DDL with `use` context. */
  val representative: String =
    """# at 100
      |#260812  5:00:00 server id 1  end_log_pos 200 CRC32 0x1a2b3c4d 	Write_rows: table id 108 flags: STMT_END_F
      |### INSERT INTO `testdb`.`t_pk`
      |### SET
      |###   @1=7 /* INT meta=0 nullable=0 is_null=0 */
      |###   @2='name_7' /* VARSTRING(160) meta=160 nullable=1 is_null=0 */
      |###   @3=NULL /* DOUBLE meta=8 nullable=1 is_null=1 */
      |# at 200
      |#260812  5:00:01 server id 1  end_log_pos 320 CRC32 0x1a2b3c4e 	Update_rows: table id 108 flags: STMT_END_F
      |### UPDATE `testdb`.`t_pk`
      |### WHERE
      |###   @1=7 /* INT */
      |###   @2='name_7' /* VARSTRING(160) */
      |###   @3=NULL /* DOUBLE */
      |### SET
      |###   @1=7 /* INT */
      |###   @2='renamed_7' /* VARSTRING(160) */
      |###   @3=3.5 /* DOUBLE */
      |# at 320
      |#260812  5:00:02 server id 1  end_log_pos 400 CRC32 0x1a2b3c4f 	Delete_rows: table id 108 flags: STMT_END_F
      |### DELETE FROM `testdb`.`t_pk`
      |### WHERE
      |###   @1=7 /* INT */
      |###   @2='renamed_7' /* VARSTRING(160) */
      |###   @3=3.5 /* DOUBLE */
      |# at 400
      |#260812  5:00:03 server id 1  end_log_pos 470 CRC32 0x1a2b3c50 	Query	thread_id=5	exec_time=0	error_code=0
      |use `testdb`/*!*/;
      |SET TIMESTAMP=1764910803/*!*/;
      |alter table t_pk add column extra int
      |/*!*/;
      |""".stripMargin

  /** PK-changing update (quirk Q3 scenario: @1 goes 1 → 9). */
  val pkChangingUpdate: String =
    """# at 500
      |#260812  5:01:00 server id 1  end_log_pos 620 CRC32 0x1a2b3c51 	Update_rows: table id 108 flags: STMT_END_F
      |### UPDATE `testdb`.`t_pk`
      |### WHERE
      |###   @1=1 /* INT */
      |###   @2='one' /* VARSTRING(160) */
      |###   @3=1.0 /* DOUBLE */
      |### SET
      |###   @1=9 /* INT */
      |###   @2='nine' /* VARSTRING(160) */
      |###   @3=9.0 /* DOUBLE */
      |""".stripMargin

  /** Adversarially-shaped corpus (the c8 entry): the input shapes a
    * production flashback run actually sees, which dmlStream's regular
    * single-table mix never exercises —
    *  - 4 tables across 3 databases, interleaved event-by-event;
    *  - NULL-heavy images, incl. NULL→value and value→NULL updates;
    *  - PK-CHANGING updates at volume (quirk Q3's hard case);
    *  - MULTI-ROW events: one Write_rows header carrying 3 row images
    *    (the FSM must emit 3 changes sharing one position window);
    *  - string literals containing `=` (log2sql.py:48 splits on every
    *    `=`; the engine splits on the first);
    *  - negative ints/doubles;
    *  - DDL statements with and without `use` context mixed in.
    * Deterministic: slot i's shape is a pure function of i (i%13==0 →
    * DDL, else i%9 picks the DML pattern), so specs can derive exact
    * per-(db,table,op) counts without parsing text. */
  def stressStream(n: Int): String = {
    val sb = new StringBuilder(n * 420)
    var pos = 4L
    var t = 0L
    def header(kind: String, stop: Long): Unit = {
      sb ++= s"# at $pos\n"
      sb ++= f"#260812 ${5 + t / 3600}%2d:${(t / 60) % 60}%02d:${t % 60}%02d server id 1  end_log_pos $stop CRC32 0x0badcafe \t$kind: table id 203 flags: STMT_END_F\n"
      t += 1
    }
    def c(k: Int, v: String, typ: String): String =
      s"###   @$k=$v /* $typ nullable=1 is_null=${if (v == "NULL") 1 else 0} */\n"
    for (i <- 0 until n) {
      if (i % 13 == 0) {
        // DDL; every other one carries a `use` context
        val stop = pos + 90
        sb ++= s"# at $pos\n"
        sb ++= f"#260812 ${5 + t / 3600}%2d:${(t / 60) % 60}%02d:${t % 60}%02d server id 1  end_log_pos $stop CRC32 0x0badcafe \tQuery\tthread_id=9\texec_time=0\terror_code=0\n"
        t += 1
        if (i % 26 == 0) sb ++= "use `appdb`/*!*/;\n"
        sb ++= s"SET TIMESTAMP=${1764910800L + i}/*!*/;\n"
        sb ++= (if (i % 26 == 0) s"alter table orders add column extra_$i int\n"
                else s"create index idx_$i on `testdb`.`t_pk` (name)\n")
        sb ++= "/*!*/;\n"
        pos = stop
      } else {
        val stop = pos + 140
        i % 9 match {
          case 0 => // multi-row insert: 3 images under ONE header
            header("Write_rows", stop)
            for (r <- 0 until 3) {
              sb ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
              sb ++= c(1, s"${i * 3 + r}", "INT")
              sb ++= c(2, s"'bulk_${i}_$r'", "VARSTRING(160)")
              sb ++= c(3, if (r == 1) "NULL" else s"$r.25", "DOUBLE")
            }
          case 1 =>
            header("Write_rows", stop)
            sb ++= "### INSERT INTO `appdb`.`orders`\n### SET\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"-$i.75", "DOUBLE")
            sb ++= c(3, if (i % 2 == 0) "NULL" else s"'promo=WINTER qty>=2 ref=$i'",
              "VARSTRING(255)")
          case 2 => // PK-changing update on a 2-col-key table
            header("Update_rows", stop)
            sb ++= "### UPDATE `testdb`.`t_multi`\n### WHERE\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"${i % 5}", "INT")
            sb ++= c(3, s"'row_$i'", "VARSTRING(64)")
            sb ++= "### SET\n"
            sb ++= c(1, s"${i + 1000000}", "INT")
            sb ++= c(2, s"${i % 5 - 2}", "INT")
            sb ++= c(3, s"'moved_$i'", "VARSTRING(64)")
          case 3 =>
            header("Delete_rows", stop)
            sb ++= "### DELETE FROM `logdb`.`audit`\n### WHERE\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"'evt=purge level=3 note=a=b'", "VARSTRING(255)")
          case 4 =>
            header("Write_rows", stop)
            sb ++= "### INSERT INTO `logdb`.`audit`\n### SET\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"'k=v; retry>=3; src=binlog'", "VARSTRING(255)")
          case 5 => // NULL→value / value→NULL transitions
            header("Update_rows", stop)
            sb ++= "### UPDATE `appdb`.`orders`\n### WHERE\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"$i.5", "DOUBLE")
            sb ++= c(3, if (i % 2 == 0) "NULL" else "'open'", "VARSTRING(255)")
            sb ++= "### SET\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, "NULL", "DOUBLE")
            sb ++= c(3, if (i % 2 == 0) "'paid=true'" else "NULL", "VARSTRING(255)")
          case 6 =>
            header("Delete_rows", stop)
            sb ++= "### DELETE FROM `testdb`.`t_pk`\n### WHERE\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"'bulk_${i}_0'", "VARSTRING(160)")
            sb ++= c(3, "NULL", "DOUBLE")
          case 7 => // non-PK update
            header("Update_rows", stop)
            sb ++= "### UPDATE `testdb`.`t_pk`\n### WHERE\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"'name_$i'", "VARSTRING(160)")
            sb ++= c(3, "NULL", "DOUBLE")
            sb ++= "### SET\n"
            sb ++= c(1, s"$i", "INT")
            sb ++= c(2, s"'renamed=$i'", "VARSTRING(160)")
            sb ++= c(3, "NULL", "DOUBLE")
          case _ => // negative ints
            header("Write_rows", stop)
            sb ++= "### INSERT INTO `testdb`.`t_multi`\n### SET\n"
            sb ++= c(1, s"-$i", "INT")
            sb ++= c(2, s"${-(i % 7)}", "INT")
            sb ++= c(3, s"'neg_$i'", "VARSTRING(64)")
        }
        pos = stop
      }
    }
    sb.result()
  }

  /** Schema-evolution corpus (the c15 entry): `appdb.evolve` starts at
    * (id, a); every 7th slot appends a tail
    * `ALTER TABLE evolve ADD COLUMN extra_i INT` under a `use` context,
    * and every later row event on the table carries the then-current
    * column width — the shape a binlog spanning migrations actually
    * has, and the one the reference's live-catalog lookup mis-decodes
    * on one side of each ALTER. Inserts and updates on the evolving
    * table interleave with control inserts on the NON-evolving
    * `testdb.t_pk`. Deterministic: slot i's shape is a pure function
    * of i. */
  /** One evolveStream event per element — the split grain for the
    * rotated-directory form. */
  private def evolveEvents(n: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    var sb = new StringBuilder(300)
    var pos = 4L
    var t = 0L
    var extras = Vector.empty[Int] // slots whose ALTER added extra_<slot>
    def header(kind: String, stop: Long): Unit = {
      sb ++= s"# at $pos\n"
      sb ++= f"#260812 ${5 + t / 3600}%2d:${(t / 60) % 60}%02d:${t % 60}%02d server id 1  end_log_pos $stop CRC32 0x0badcafe \t$kind: table id 301 flags: STMT_END_F\n"
      t += 1
    }
    def c(k: Int, v: String, typ: String): String =
      s"###   @$k=$v /* $typ nullable=1 is_null=${if (v == "NULL") 1 else 0} */\n"
    def image(i: Int): Unit = {
      sb ++= c(1, s"$i", "INT")
      sb ++= c(2, s"'a_$i'", "VARSTRING(64)")
      extras.zipWithIndex.foreach { case (slot, j) =>
        sb ++= c(3 + j, s"${slot + i}", "INT")
      }
    }
    for (i <- 0 until n) {
      if (i % 7 == 0) {
        val stop = pos + 90
        sb ++= s"# at $pos\n"
        sb ++= f"#260812 ${5 + t / 3600}%2d:${(t / 60) % 60}%02d:${t % 60}%02d server id 1  end_log_pos $stop CRC32 0x0badcafe \tQuery\tthread_id=9\texec_time=0\terror_code=0\n"
        t += 1
        sb ++= "use `appdb`/*!*/;\n"
        sb ++= s"SET TIMESTAMP=${1764910800L + i}/*!*/;\n"
        sb ++= s"alter table evolve add column extra_$i int\n"
        sb ++= "/*!*/;\n"
        extras :+= i
        pos = stop
      } else {
        val stop = pos + 140
        if (i % 7 == 3) { // control: the non-evolving table
          header("Write_rows", stop)
          sb ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
          sb ++= c(1, s"$i", "INT")
          sb ++= c(2, s"'name_$i'", "VARSTRING(160)")
          sb ++= c(3, s"$i.5", "DOUBLE")
        } else if (i % 7 == 5) { // full-width update on the evolving table
          header("Update_rows", stop)
          sb ++= "### UPDATE `appdb`.`evolve`\n### WHERE\n"
          image(i)
          sb ++= "### SET\n"
          image(i + 1000000)
        } else {
          header("Write_rows", stop)
          sb ++= "### INSERT INTO `appdb`.`evolve`\n### SET\n"
          image(i)
        }
        pos = stop
      }
      out += sb.result(); sb = new StringBuilder(300)
    }
    out.result()
  }

  def evolveStream(n: Int): String = evolveEvents(n).mkString

  /** [[evolveStream]] split across `parts` ROTATED files at event
    * boundaries: ALTERs land mid-DIRECTORY, so a consumer that resolves
    * schema per-file (or, streaming, per-micro-batch without carried
    * state) decodes later files' rows against the wrong version — the
    * c19 scenario. Concatenating the parts reproduces evolveStream(n)
    * byte-for-byte (spec'd), so batch-over-directory and the original
    * single file share one schema history. */
  def evolveStreamParts(n: Int, parts: Int): Seq[String] = {
    val evs = evolveEvents(n)
    val per = (evs.length + parts - 1) / parts
    evs.grouped(per).map(_.mkString).toSeq
  }

  /** Per-slot (db, table, op, rows) composition of [[stressStream]] —
    * the same modular arithmetic, WITHOUT going through text: specs
    * compare FSM parse counts against this independent derivation. */
  def stressComposition(n: Int): Map[(String, String, String), Long] = {
    val m = mutable.Map.empty[(String, String, String), Long].withDefaultValue(0L)
    for (i <- 0 until n) {
      if (i % 13 == 0) m(("", "", "ddl")) += 1
      else i % 9 match {
        case 0 => m(("testdb", "t_pk", "insert")) += 3
        case 1 => m(("appdb", "orders", "insert")) += 1
        case 2 => m(("testdb", "t_multi", "update")) += 1
        case 3 => m(("logdb", "audit", "delete")) += 1
        case 4 => m(("logdb", "audit", "insert")) += 1
        case 5 => m(("appdb", "orders", "update")) += 1
        case 6 => m(("testdb", "t_pk", "delete")) += 1
        case 7 => m(("testdb", "t_pk", "update")) += 1
        case _ => m(("testdb", "t_multi", "insert")) += 1
      }
    }
    m.toMap
  }

  /** SELF-CONSISTENT DML stream (the c24 flashback-apply fixture): a
    * real server's row-format binlog records the TRUE before image —
    * every update/delete targets a row that exists with exactly the
    * logged values, which is what makes flashback (-B) sound: undoing
    * a tail by re-applying logged before images reproduces the exact
    * pre-tail state. (dmlStream/stressStream fabricate WHERE images
    * for parser adversity — fine for parse/render/materialize tests,
    * wrong for an undo fixture.) The generator maintains the table
    * state while emitting: inserts create fresh ids; updates/deletes
    * pick an existing id deterministically and use its CURRENT values
    * as the WHERE image; every 5th eligible slot is a PK-MOVE (the
    * Q3 hard case — undo must restore the old key AND drop the new).
    * Returned split across `parts` rotated files at event boundaries.
    * Deterministic: a pure function of (n, parts). */
  def consistentStreamParts(n: Int, parts: Int): Seq[String] = {
    val state = scala.collection.mutable.LinkedHashMap.empty[Long, (String, String)]
    var nextId = 0L
    val events = Vector.newBuilder[String]
    var pos = 4L
    var t = 0L
    def c(k: Int, v: String, typ: String): String =
      s"###   @$k=$v /* $typ nullable=1 is_null=${if (v == "NULL") 1 else 0} */\n"
    for (i <- 0 until n) {
      val sb = new StringBuilder(340)
      val stop = pos + 140
      def header(kind: String): Unit = {
        sb ++= s"# at $pos\n"
        sb ++= f"#260812 ${5 + t / 3600}%2d:${(t / 60) % 60}%02d:${t % 60}%02d server id 1  end_log_pos $stop CRC32 0x0badcafe \t$kind: table id 204 flags: STMT_END_F\n"
        t += 1
      }
      def img(id: Long, v: (String, String)): Unit = {
        sb ++= c(1, id.toString, "INT")
        sb ++= c(2, v._1, "VARSTRING(160)")
        sb ++= c(3, v._2, "DOUBLE")
      }
      val existing = state.keysIterator.toIndexedSeq
      val action = if (existing.isEmpty) 0 else i % 5
      action match {
        case 0 | 1 => // insert a fresh id
          val id = nextId; nextId += 1
          val v = (s"'ins_${i}_$id'", if (i % 3 == 0) "NULL" else s"$i.25")
          header("Write_rows")
          sb ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
          img(id, v)
          state(id) = v
        case 2 | 4 => // update an existing row; every 5th slot PK-moves
          val id = existing(((i * 7) % existing.size + existing.size) % existing.size)
          val before = state(id)
          val moved = action == 4
          val newId = if (moved) { val x = nextId; nextId += 1; x } else id
          val after = (s"'upd_$i'", if (i % 4 == 0) "NULL" else s"${i % 97}.5")
          header("Update_rows")
          sb ++= "### UPDATE `testdb`.`t_pk`\n### WHERE\n"
          img(id, before)
          sb ++= "### SET\n"
          img(newId, after)
          state.remove(id)
          state(newId) = after
        case _ => // delete an existing row — true before image
          val id = existing(((i * 11) % existing.size + existing.size) % existing.size)
          val before = state(id)
          header("Delete_rows")
          sb ++= "### DELETE FROM `testdb`.`t_pk`\n### WHERE\n"
          img(id, before)
          state.remove(id)
      }
      pos = stop
      events += sb.result()
    }
    val evs = events.result()
    val per = (evs.length + parts - 1) / parts
    evs.grouped(per).map(_.mkString).toSeq
  }

  /** Write a rotated-binlog directory: `parts` files of `perFile`
    * events each (binlogs rotate at fixed size — files are the CDC
    * parallelism unit at any scale). Returns the directory path. */
  def materializeDir(name: String, parts: Int, perFile: Int,
      gen: Int => String = dmlStream): String = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_binlogdir_$name")
    if (!java.nio.file.Files.isDirectory(dir)) {
      // temp dir on the TARGET's own filesystem: the no-parent form
      // pins the JVM-startup tmpdir, and Files.move of a non-empty
      // directory across filesystems throws (a relocated
      // java.io.tmpdir — e.g. the bench's tmpfs root — hits exactly
      // that)
      val tmp = java.nio.file.Files.createTempDirectory(
        dir.getParent, "graft_binlogdir")
      for (i <- 0 until parts)
        java.nio.file.Files.writeString(
          tmp.resolve(f"binlog.$i%06d.txt"), gen(perFile))
      try java.nio.file.Files.move(tmp, dir)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    dir.toString
  }

  /** Write a rotated-binlog directory from EXPLICIT per-file contents
    * (one evolving stream split across rotation boundaries — unlike
    * [[materializeDir]], whose generator emits the same content per
    * file). Returns the directory path. */
  def materializeDirParts(name: String, contents: => Seq[String]): String = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_binlogdir_$name")
    if (!java.nio.file.Files.isDirectory(dir)) {
      val tmp = java.nio.file.Files.createTempDirectory(
        dir.getParent, "graft_binlogdir") // target filesystem, see above
      val n = contents.size
      contents.zipWithIndex.foreach { case (c, i) =>
        val p = tmp.resolve(f"binlog.$i%06d.txt")
        java.nio.file.Files.writeString(p, c)
        // ascending mtimes, one minute apart: binlog rotation closes
        // file N before N+1 exists, and Spark's file-stream source
        // orders discovery by modification time — equal mtimes (all
        // parts written this instant) would make catch-up arrival
        // order arbitrary, which no real rotating directory produces
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - (n - i) * 60000L))
      }
      try java.nio.file.Files.move(tmp, dir)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    dir.toString
  }

  /** Write a fixture to a temp file once per (name,n); returns path.
    * Used by the c-series query entries so Verify/Bench can run the
    * CDC pipeline without external input. */
  def materialize(name: String, content: => String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_binlog_$name.txt")
    if (!java.nio.file.Files.exists(p)) {
      val tmp = java.nio.file.Files.createTempFile(
        p.getParent, "graft_binlog", ".tmp") // target filesystem, see above
      java.nio.file.Files.writeString(tmp, content)
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    p.toString
  }
}
