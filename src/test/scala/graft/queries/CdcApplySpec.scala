package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c23 apply-sink properties the oracle hash can't isolate on its
  * own: the epoch fence (a replayed batch is skipped), commutativity
  * (stamped merge converges from any batch order), and read-back
  * equality with the reference materialization (c9's operator). */
class CdcApplySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The stress fixture parsed per FILE — two natural "batches". */
  private lazy val fileBatches = {
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val events = graft.cdc.CdcJob.parse(spark, p)
    val files = events.select("file").distinct()
      .collect().map(_.getString(0)).sorted
    assert(files.length == 2)
    files.map(f => events.filter(col("file") === f))
  }

  private def stateOf(url: String): Set[(String, String, Long, String, String)] =
    CdcApply.readState(spark, url).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet

  test("c23: apply in order equals c9 materialization; replayed epoch is fenced") {
    val url = CdcApply.newTargetUrl()
    CdcApply.applyBatch(url, "spec1", 0L, fileBatches(0))
    CdcApply.applyBatch(url, "spec1", 1L, fileBatches(1))
    val applied = stateOf(url)
    // the live target equals the reference materialization operator
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val mat = CdcQueries.materializeFromFlat(
        CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    assert(applied == mat)
    // REPLAY: re-applying an already-committed epoch — even with the
    // other batch's content — must be a no-op (the fence fires before
    // any merge statement runs)
    CdcApply.applyBatch(url, "spec1", 1L, fileBatches(0))
    assert(stateOf(url) == applied, "replayed epoch must be skipped")
    CdcApply.applyBatch(url, "spec1", 0L, fileBatches(1))
    assert(stateOf(url) == applied)
    CdcApply.dropTarget(url)
  }

  test("c24: flashback apply returns the live target to the pre-tail state") {
    import org.apache.spark.sql.DataFrame
    val p = graft.cdc.BinlogFixture.materializeDirParts("consistent_v1",
      graft.cdc.BinlogFixture.consistentStreamParts(3000, 2))
    val events = graft.cdc.CdcJob.parse(spark, p)
    val flat = CdcQueries.flattenImages(events)
    val files = flat.select("file").distinct()
      .collect().map(_.getString(0)).sorted
    assert(files.length == 2)
    val url = CdcApply.newTargetUrl()
    files.zipWithIndex.foreach { case (f, i) =>
      CdcApply.applyBatch(url, "fbspec", i.toLong,
        events.filter(col("file") === f))
    }
    val afterForward = stateOf(url)
    def mat(fl: DataFrame): Set[(String, String, Long, String, String)] =
      CdcQueries.materializeFromFlat(fl).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getString(3), r.getString(4))).toSet
    assert(afterForward == mat(flat), "forward apply must match c9 first")
    // undo the last file with ONE compensating batch
    CdcApply.applyActions(url, "fbspec", files.length.toLong,
      CdcQueries.flashbackActions(flat.filter(col("file") === files.last))
        .withColumn("file", lit("~flashback"))
        .withColumn("seq", lit(0L)).withColumn("rnk", lit(0)))
    val afterUndo = stateOf(url)
    val truncated = mat(flat.filter(col("file") === files.head))
    assert(afterUndo == truncated,
      "flashback must equal the state had the tail never been applied")
    assert(afterForward != afterUndo, "fixture must make the undo observable")
    CdcApply.dropTarget(url)
  }

  test("c25: evolved apply == sequential interpreter; ALTER fenced with its batch; replay is a no-op") {
    val p = graft.cdc.BinlogFixture.materializeDirParts("evolve_apply_spec_v1",
      graft.cdc.BinlogFixture.evolveStreamParts(70, 2))
    val events = graft.cdc.CdcJob.parse(spark, p, includeDdl = true)
    val files = events.select("file").distinct()
      .collect().map(_.getString(0)).sorted
    assert(files.length == 2)
    val url = CdcApply.newTargetUrl()
    var ddls: Seq[(String, Long, String, String)] = Nil
    files.zipWithIndex.foreach { case (f, i) =>
      ddls = CdcApply.applyEvolvedBatch(url, "evspec", i.toLong,
        events.filter(col("file") === f), "appdb", "evolve",
        IndexedSeq("id", "a"), ddls)
    }
    val applied = CdcApply.readEvolvedState(spark, url, "appdb", "evolve")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    // independent twin: a SEQUENTIAL interpreter over the sorted log —
    // one schema vector mutated in event order, one row map. DDL
    // events carry db="" (the `use` context rides inside the ddl
    // text), so select by op, not db.
    val evs = events
      .select("file", "seq", "op", "ddl", "table",
        "beforeOrds", "beforeVals", "afterOrds", "afterVals")
      .collect().sortBy(r => (r.getString(0), r.getLong(1)))
    var cols = Vector("id", "a")
    val state = scala.collection.mutable.Map.empty[Long, Map[String, String]]
    val add = "alter table evolve add column ([A-Za-z0-9_]+)".r
    evs.foreach { r =>
      val op = r.getString(2)
      if (op == "ddl") {
        add.findFirstMatchIn(Option(r.getString(3)).getOrElse(""))
          .foreach(m => cols :+= m.group(1))
      } else if (r.getString(4) == "evolve") {
        val bo = r.getSeq[Int](5); val bv = r.getSeq[String](6)
        val ao = r.getSeq[Int](7); val av = r.getSeq[String](8)
        if ((op == "update" || op == "delete") && bo.nonEmpty)
          state.remove(bv(bo.indexOf(1)).toLong)
        if ((op == "insert" || op == "update") && ao.nonEmpty)
          state(av(ao.indexOf(1)).toLong) =
            ao.zip(av).map { case (o, v) => cols(o - 1) -> v }.toMap
      }
    }
    val expected = state.iterator.flatMap { case (id, m) =>
      m.iterator.filter(_._1 != "id").map { case (n, v) => (id, n, v) }
    }.toSet
    assert(applied == expected, "live target must equal the sequential replay")
    // non-vacuity of the evolution semantics: added columns are
    // populated, and some live row predates a later ALTER (carries
    // fewer extras than the final schema)
    val finalExtras = cols.count(_.startsWith("extra_"))
    assert(finalExtras > 0, "fixture must evolve")
    val extrasPerId = applied.groupBy(_._1)
      .map { case (id, s) => id -> s.count(_._2.startsWith("extra_")) }
    assert(extrasPerId.values.exists(_ > 0),
      "post-ALTER rows must carry added columns")
    assert(extrasPerId.values.exists(_ < finalExtras),
      "some live row must predate a later ALTER (NULL in its columns)")
    // replay an already-committed epoch — even with the OTHER batch's
    // content: fence fires, no merge, no double-ALTER
    CdcApply.applyEvolvedBatch(url, "evspec", 1L,
      events.filter(col("file") === files.head), "appdb", "evolve",
      IndexedSeq("id", "a"), ddls)
    val replayed = CdcApply.readEvolvedState(spark, url, "appdb", "evolve")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(replayed == applied, "replayed epoch must be skipped")
    CdcApply.dropTarget(url)
  }

  test("c23: stamped merge commutes — reverse batch order converges to the same state") {
    val fwd = CdcApply.newTargetUrl()
    CdcApply.applyBatch(fwd, "specF", 0L, fileBatches(0))
    CdcApply.applyBatch(fwd, "specF", 1L, fileBatches(1))
    val rev = CdcApply.newTargetUrl()
    CdcApply.applyBatch(rev, "specR", 0L, fileBatches(1))
    CdcApply.applyBatch(rev, "specR", 1L, fileBatches(0))
    assert(stateOf(fwd) == stateOf(rev),
      "out-of-order application must converge (stamps, not arrival order)")
    assert(stateOf(fwd).nonEmpty)
    CdcApply.dropTarget(fwd); CdcApply.dropTarget(rev)
  }
}
