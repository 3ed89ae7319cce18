package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c23: the CDC APPLY sink — closing the loop the reference exists
  * for. `log2sql.py:185` prints statements *to be applied to a
  * database* (replay/flashback); the engine until now rendered them
  * (C2/C3 byte-parity), landed lakes (c11) and SCD2 dimensions
  * (c20/c21), and read JDBC (i11) — but never applied changes to a
  * LIVE target. This is the exactly-once `foreachBatch` JDBC apply,
  * against embedded Derby, with epoch fencing.
  *
  * The recipe (the production foreachBatch→JDBC pattern):
  *
  *  1. STAGE — fold the micro-batch to ONE action per (db, table,
  *     key): last-writer by the (file, seq, rnk) stamp, tombstones
  *     retained (c9's argmax), then write it to a staging table with
  *     Spark's DISTRIBUTED JDBC writer. The data moves in parallel
  *     across executors; nothing is applied yet, and a replayed batch
  *     merely overwrites its own staging rows.
  *  2. FENCE + MERGE — one driver-side transaction:
  *     (a) INSERT (job_id, epoch) into the fence table; a primary-key
  *         violation means this epoch already COMMITTED — roll back
  *         and skip the whole batch. foreachBatch is at-least-once;
  *         the fence makes the apply exactly-once.
  *     (b) merge the staged actions into the per-table targets
  *         SET-BASED (one DELETE + one INSERT per table, never a row
  *         loop): a staged action replaces the target row only when
  *         its stamp is >= the existing row's, and tombstones are
  *         stored (keep_row = 0), so application is COMMUTATIVE and
  *         IDEMPOTENT across batches — the [[CdcQueries.mergeState]]
  *         property expressed in the target database's SQL.
  *     (c) COMMIT. Crash between stage and commit: nothing applied,
  *         the retry re-stages and finds no fence row. Crash after
  *         commit: the retry hits the fence and skips.
  *
  * Scale shape: the distributed stage write carries the data; the
  * fenced transaction touches only metadata plus set-based SQL over
  * the batch-sized staging table — per batch the target pays
  * O(batch), never O(table). The driver-side loop is over the
  * DISTINCT TABLES in the batch (schema count — the same bounded
  * contract as the DDL accumulator), not over rows.
  */
object CdcApply {

  private val urlCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Spark's built-in Derby dialect maps StringType to CLOB — fine
    * for the i11 source fixture, fatal here: the stage table's
    * comparable VARCHAR columns reject a NULL sent as
    * `setNull(Types.CLOB)` ("attempt to get a data value of type
    * 'VARCHAR' from ... 'CLOB'"). Register a dialect scoped to the
    * apply-target URLs only that keeps strings VARCHAR end-to-end. */
  private object ApplyTargetDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:derby:memory:graft_cdc_apply_")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
        : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(512)",
          java.sql.Types.VARCHAR))
      case _ => None
    }
  }
  private lazy val registerDialect: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(ApplyTargetDialect)

  /** A fresh in-memory Derby database per apply run (batch-scoped
    * fixture, like every other per-JVM fixture in this package). */
  private[queries] def newTargetUrl(): String =
    "jdbc:derby:memory:graft_cdc_apply_" +
      s"${ProcessHandle.current().pid()}_${urlCounter.incrementAndGet()};create=true"

  /** Drop an in-memory target database. In-memory Derby retains every
    * database until an explicit drop or JVM exit, and each bench pass
    * mints a fresh one — without this, staged+target datasets of every
    * pass accumulate in driver heap for the JVM's life. Callers must
    * have MATERIALIZED any frame reading from the target first
    * (localCheckpoint) — the connection is gone after this. */
  private[queries] def dropTarget(url: String): Unit = {
    val dropUrl = url.replace(";create=true", ";drop=true")
    try { java.sql.DriverManager.getConnection(dropUrl).close() }
    catch { // 08006 = single-database shutdown completed — the success path
      case e: java.sql.SQLException if e.getSQLState == "08006" => ()
      case _: java.sql.SQLException => ()
    }
  }

  private def withConn[T](url: String)(f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c)
    catch { case t: Throwable =>
      // roll back before close: Derby refuses to close a connection
      // with an open transaction, which would mask the real failure
      try if (!c.getAutoCommit) c.rollback() catch { case _: java.sql.SQLException => () }
      throw t
    }
    finally c.close()
  }

  private def exec(c: java.sql.Connection, sql: String): Unit = {
    val st = c.createStatement()
    try { st.execute(sql); () } finally st.close()
  }

  /** CREATE TABLE unless present (Derby has no IF NOT EXISTS;
    * SQLState X0Y32 = object already exists). */
  private def createIfAbsent(c: java.sql.Connection, ddl: String): Unit =
    try exec(c, ddl)
    catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }

  private def tgtName(db: String, table: String): String =
    ("tgt_" + db + "_" + table).replaceAll("[^A-Za-z0-9_]", "_")

  private def ensureFence(c: java.sql.Connection): Unit =
    createIfAbsent(c,
      """CREATE TABLE applied_epochs(
        |  job_id VARCHAR(64) NOT NULL, epoch BIGINT NOT NULL,
        |  PRIMARY KEY (job_id, epoch))""".stripMargin)

  private def ensureTarget(c: java.sql.Connection, name: String): Unit =
    createIfAbsent(c,
      s"""CREATE TABLE $name(
         |  dbname VARCHAR(64) NOT NULL, tname VARCHAR(64) NOT NULL,
         |  id BIGINT NOT NULL,
         |  c2 VARCHAR(512), c3 VARCHAR(512),
         |  keep_row INT NOT NULL,
         |  sfile VARCHAR(512) NOT NULL, sseq BIGINT NOT NULL,
         |  srnk INT NOT NULL,
         |  PRIMARY KEY (dbname, tname, id))""".stripMargin)

  /** Apply ONE micro-batch of parsed change events exactly once. */
  private[queries] def applyBatch(url: String, jobId: String, epoch: Long,
      batch: DataFrame): Unit =
    applyActions(url, jobId, epoch,
      CdcQueries.foldBatchActions(CdcQueries.flattenImages(batch)))

  /** Apply PRE-FOLDED stamped actions (one per key) exactly once —
    * the shared kernel of the forward apply (c23) and the flashback
    * compensating batch (c24, which supplies a stamp above every log
    * stamp so the correction wins the merge). */
  private[queries] def applyActions(url: String, jobId: String, epoch: Long,
      actions: DataFrame): Unit = {
    registerDialect
    val acts = actions
      .select(col("db").as("dbname"), col("table").as("tname"),
        col("id").cast("long").as("id"), col("c2"), col("c3"),
        col("keep").as("keep_row"), col("file").as("sfile"),
        col("seq").as("sseq"), col("rnk").as("srnk"))
    val stage = s"stage_$jobId"
    // distributed stage write — Derby's dialect maps StringType to
    // CLOB, which cannot appear in the merge's comparisons: force
    // comparable VARCHARs
    acts.write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", stage)
      .option("createTableColumnTypes",
        // sfile carries input_file_name()'s FULL URI — 59 chars for
        // the fixture under /tmp, longer under any relocated tmpdir:
        // width it like every other free-text column
        "dbname VARCHAR(64), tname VARCHAR(64), c2 VARCHAR(512), " +
          "c3 VARCHAR(512), sfile VARCHAR(512)")
      .save()
    withConn(url) { c =>
      c.setAutoCommit(false)
      // distinct tables in this batch — schema-count bounded, not
      // rows; read from the JUST-WRITTEN staging table so the fold
      // plan is executed once (the stage write), not twice
      val tables = {
        val st = c.createStatement()
        try {
          val rs = st.executeQuery(
            s"""SELECT DISTINCT "dbname", "tname" FROM $stage""")
          val b = List.newBuilder[(String, String)]
          while (rs.next()) b += ((rs.getString(1), rs.getString(2)))
          rs.close()
          b.result().sorted
        } finally st.close()
      }
      ensureFence(c)
      val fenceTaken =
        try { exec(c, s"INSERT INTO applied_epochs VALUES ('$jobId', $epoch)"); true }
        catch {
          case e: java.sql.SQLException if e.getSQLState == "23505" =>
            c.rollback() // epoch already committed — the fence fires
            false
        }
      if (fenceTaken) {
      tables.foreach { case (db, tbl) =>
        val tgt = tgtName(db, tbl)
        ensureTarget(c, tgt)
        // stamped replace: drop target rows an equal-or-newer staged
        // action supersedes ...
        // the stage table is created by Spark's JDBC writer, which
        // QUOTES identifiers — reference its columns quoted lowercase
        // target-side dbname/tname predicates: tgtName's sanitized
        // join is not injective (a_b+c and a+b_c share one name), so
        // key matching must carry the real names on BOTH sides
        exec(c,
          s"""DELETE FROM $tgt WHERE dbname = '$db' AND tname = '$tbl'
             |AND EXISTS (
             |  SELECT 1 FROM $stage s
             |  WHERE s."dbname" = '$db' AND s."tname" = '$tbl'
             |    AND s."id" = $tgt.id
             |    AND (s."sfile" > $tgt.sfile OR (s."sfile" = $tgt.sfile
             |      AND (s."sseq" > $tgt.sseq OR (s."sseq" = $tgt.sseq
             |        AND s."srnk" >= $tgt.srnk)))))""".stripMargin)
        // ... then insert staged actions not blocked by a strictly
        // newer surviving row — together: argmax by stamp, in SQL
        exec(c,
          s"""INSERT INTO $tgt
             |SELECT s."dbname", s."tname", s."id", s."c2", s."c3",
             |       s."keep_row", s."sfile", s."sseq", s."srnk"
             |FROM $stage s
             |WHERE s."dbname" = '$db' AND s."tname" = '$tbl'
             |  AND NOT EXISTS (SELECT 1 FROM $tgt x WHERE x.id = s."id"
             |    AND x.dbname = '$db' AND x.tname = '$tbl')""".stripMargin)
      }
      c.commit()
      }
    }
  }

  /** c25: one fenced micro-batch of an EVOLVING table applied to the
    * live target, DDL INCLUDED — the piece c23/c24 left out: the
    * reference's `--include-ddl` output exists so a replay carries
    * schema changes too, and a long-lived apply target must evolve
    * WITH the log or every post-ALTER row event loses its new
    * columns. Derby DDL is transactional, so the ALTER and the DML
    * merge commit (or roll back) as ONE fenced unit:
    *
    *  1. The batch's DDL folds into the accumulated statement list
    *     (driver state, bounded by the human-DDL contract — c19's
    *     accumulator) and `SchemaEvolve.foldDdls` rebuilds the
    *     positioned timeline, so every row event resolves its column
    *     NAMES against the schema version at ITS log position (the
    *     c15 decode, applied to the sink side).
    *  2. Name resolution is DISTRIBUTED: the (tiny) version table
    *     broadcast-joins the batch, each event picks its version by
    *     position (last version strictly before it), and per-column
    *     values lift out of the positional image by resolved name —
    *     events predating an ALTER simply leave the later columns
    *     NULL, exactly what the target database would hold had each
    *     statement been applied at its own time.
    *  3. Within-batch fold to one action per key (last-writer by
    *     stamp), distributed stage write, then the fenced driver
    *     transaction: ADD COLUMN for any timeline column the target
    *     lacks (diffed against live JDBC metadata — idempotent under
    *     replay and crash-retry), then the same stamped set-based
    *     DELETE+INSERT merge as c23, column list widened to the
    *     evolved schema.
    *
    * Returns the updated accumulated-DDL list for the next batch. */
  private[queries] def applyEvolvedBatch(url: String, jobId: String,
      epoch: Long, batch: DataFrame, db: String, table: String,
      baseCols: IndexedSeq[String],
      ddlsSoFar: Seq[(String, Long, String, String)])
      : Seq[(String, Long, String, String)] = {
    registerDialect
    val spark = batch.sparkSession
    val batchDdls = batch.filter(col("op") === "ddl")
      .select("file", "seq", "db", "ddl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq
    val allDdls = ddlsSoFar ++ batchDdls
    val timeline = graft.cdc.SchemaEvolve
      .foldDdls(Map((db, table) -> baseCols), allDdls)
      .getOrElse((db, table), Vector(("", -1L, baseCols)))
    val valueCols = timeline.last._3.filterNot(_ == "id")

    val versions = spark.createDataFrame(
      timeline.map { case (f, sq, cols) => (f, sq, cols) })
      .toDF("vfile", "vseq", "vcols")
    val dml = batch.filter(col("op").isin("insert", "update", "delete") &&
      col("db") === db && col("table") === table)
    // version in effect at each event: last version strictly before
    // its (file, seq) — the base version ("", -1) matches everything
    import org.apache.spark.sql.expressions.Window
    val resolved = dml.join(broadcast(versions),
        col("vfile") < col("file") ||
          (col("vfile") === col("file") && col("vseq") < col("seq")))
      .withColumn("vrn", row_number().over(Window.partitionBy("file", "seq")
        .orderBy(col("vfile").desc, col("vseq").desc)))
      .filter(col("vrn") === 1)

    // lift a positional image cell by RESOLVED name (1-based ordinal
    // into the version's column list)
    // get(): NULL (not an ANSI error) when the image lacks the column
    def cell(ords: String, vals: String, name: String) =
      expr(s"get(filter(arrays_zip($ords, $vals), " +
        s"x -> element_at(vcols, x.$ords) = '$name'), 0).$vals")
    def idOf(ords: String, vals: String) =
      cell(ords, vals, "id").cast("long")

    val tomb = resolved
      .filter(col("op").isin("update", "delete") && size(col("beforeOrds")) > 0)
      .select(Seq(idOf("beforeOrds", "beforeVals").as("id"),
        lit(0).as("keep_row"), col("file").as("sfile"),
        col("seq").as("sseq"), lit(0).as("srnk")) ++
        valueCols.map(c => lit(null).cast("string").as(c)): _*)
    val ups = resolved
      .filter(col("op").isin("insert", "update") && size(col("afterOrds")) > 0)
      .select(Seq(idOf("afterOrds", "afterVals").as("id"),
        lit(1).as("keep_row"), col("file").as("sfile"),
        col("seq").as("sseq"), lit(1).as("srnk")) ++
        valueCols.map(c => cell("afterOrds", "afterVals", c).as(c)): _*)
    // within-batch fold: ONE action per key, last-writer by stamp
    val actions = tomb.unionByName(ups).filter(col("id").isNotNull)
      .withColumn("arn", row_number().over(Window.partitionBy("id")
        .orderBy(col("sfile").desc, col("sseq").desc, col("srnk").desc)))
      .filter(col("arn") === 1).drop("arn")

    val stage = s"stage_ev_$jobId"
    actions.write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", stage)
      .option("createTableColumnTypes",
        ("sfile VARCHAR(512)" +: valueCols.map(c => s"$c VARCHAR(512)"))
          .mkString(", "))
      .save()

    withConn(url) { c =>
      c.setAutoCommit(false)
      ensureFence(c)
      val fenceTaken =
        try { exec(c, s"INSERT INTO applied_epochs VALUES ('$jobId', $epoch)"); true }
        catch {
          case e: java.sql.SQLException if e.getSQLState == "23505" =>
            c.rollback() // epoch already committed — the fence fires
            false
        }
      if (fenceTaken) {
        val tgt = tgtName(db, table)
        createIfAbsent(c,
          s"""CREATE TABLE $tgt(
             |  id BIGINT NOT NULL, keep_row INT NOT NULL,
             |  sfile VARCHAR(512) NOT NULL, sseq BIGINT NOT NULL,
             |  srnk INT NOT NULL, PRIMARY KEY (id))""".stripMargin)
        // evolve the TARGET: add every timeline column it lacks, by
        // live metadata diff — idempotent under replay and crash-retry
        val present = {
          val rs = c.getMetaData.getColumns(null, "APP", tgt.toUpperCase, null)
          val b = Set.newBuilder[String]
          while (rs.next()) b += rs.getString("COLUMN_NAME").toUpperCase
          rs.close(); b.result()
        }
        valueCols.filterNot(v => present.contains(v.toUpperCase)).foreach {
          v => exec(c, s"ALTER TABLE $tgt ADD COLUMN $v VARCHAR(512)")
        }
        exec(c,
          s"""DELETE FROM $tgt WHERE EXISTS (
             |  SELECT 1 FROM $stage s WHERE s."id" = $tgt.id
             |    AND (s."sfile" > $tgt.sfile OR (s."sfile" = $tgt.sfile
             |      AND (s."sseq" > $tgt.sseq OR (s."sseq" = $tgt.sseq
             |        AND s."srnk" >= $tgt.srnk)))))""".stripMargin)
        val colList = Seq("id", "keep_row", "sfile", "sseq", "srnk") ++ valueCols
        exec(c,
          s"""INSERT INTO $tgt (${colList.mkString(", ")})
             |SELECT ${colList.map(n => s"""s."$n"""").mkString(", ")}
             |FROM $stage s
             |WHERE NOT EXISTS (SELECT 1 FROM $tgt x WHERE x.id = s."id")""".stripMargin)
        c.commit()
      }
    }
    allDdls
  }

  /** The evolved table's live state read BACK from the target,
    * UNPIVOTED to (id, colname, value) — a STABLE three-column shape
    * whatever the schema grew into, so the driver compare needs no
    * per-fixture column list. Column names come from the live JDBC
    * metadata (Derby uppercases unquoted identifiers; fold back). */
  private[queries] def readEvolvedState(s: SparkSession, url: String,
      db: String, table: String): DataFrame = {
    val meta = Set("ID", "KEEP_ROW", "SFILE", "SSEQ", "SRNK")
    val df = s.read.format("jdbc")
      .option("url", url).option("dbtable", tgtName(db, table).toUpperCase)
      .load()
    val valueCols = df.columns.filterNot(c => meta.contains(c.toUpperCase))
    df.filter(col("KEEP_ROW") === 1)
      .unpivot(Array(col("ID").as("id")), valueCols.map(col),
        "colname", "value")
      .filter(col("value").isNotNull)
      .select(col("id"), lower(col("colname")).as("colname"), col("value"))
  }

  /** The applied state, read BACK from the live target over JDBC —
    * live rows only (tombstones are storage, not state). */
  private[queries] def readState(s: SparkSession, url: String): DataFrame = {
    val names = withConn(url) { c =>
      val rs = c.getMetaData.getTables(null, "APP", "TGT_%", Array("TABLE"))
      val b = List.newBuilder[String]
      while (rs.next()) b += rs.getString("TABLE_NAME")
      rs.close()
      b.result()
    }
    names.sorted
      .map(n => s.read.format("jdbc")
        .option("url", url).option("dbtable", n).load())
      .reduceOption(_ unionByName _)
      .map(df => df.filter(col("KEEP_ROW") === 1)
        .select(col("DBNAME").as("db"), col("TNAME").as("table"),
          col("ID").as("id"), col("C2").as("c2"), col("C3").as("c3")))
      .getOrElse {
        import org.apache.spark.sql.types._
        s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(StructField("db", StringType),
            StructField("table", StringType), StructField("id", LongType),
            StructField("c2", StringType), StructField("c3", StringType))))
      }
  }
}
