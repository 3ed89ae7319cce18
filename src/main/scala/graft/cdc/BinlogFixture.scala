package graft.cdc

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

  /** Write a rotated-binlog directory: `parts` files of `perFile`
    * events each (binlogs rotate at fixed size — files are the CDC
    * parallelism unit at any scale). Returns the directory path. */
  def materializeDir(name: String, parts: Int, perFile: Int): String = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_binlogdir_$name")
    if (!java.nio.file.Files.isDirectory(dir)) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_binlogdir")
      for (i <- 0 until parts)
        java.nio.file.Files.writeString(
          tmp.resolve(f"binlog.$i%06d.txt"), dmlStream(perFile))
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
      val tmp = java.nio.file.Files.createTempFile("graft_binlog", ".tmp")
      java.nio.file.Files.writeString(tmp, content)
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    p.toString
  }
}
