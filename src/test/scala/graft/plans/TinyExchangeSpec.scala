package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TinyExchangeElimination invariants: fires only when it should
  * (ENSURE_REQUIREMENTS origin, tiny file-backed input, batch plan,
  * non-adaptive session), rewrites to an exchange-free plan, and the
  * rewritten plan computes the identical result. The rule is applied
  * DIRECTLY here (the injection wiring — GraftExtensions.injectColumnar
  * → preColumnarTransitions — is exercised end-to-end by the Bench and
  * Verify sessions, which build with `.withExtensions`; a shared-JVM
  * test session cannot re-apply extensions after the fact). */
class TinyExchangeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Plan under a pinned non-adaptive conf (shared-JVM sessions may
    * arrive with sibling suites' runtime confs). */
  private def planOf(df: => DataFrame) = {
    SparkSession.setActiveSession(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    df.queryExecution.executedPlan
  }

  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect { case _: ShuffleExchangeExec => 1 }.sum

  private def withRule[A](confs: (String, String)*)(body: => A): A = {
    SparkSession.setActiveSession(spark)
    spark.conf.set(TinyExchangeElimination.EnabledKey, "true")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally {
      spark.conf.set(TinyExchangeElimination.EnabledKey, "false")
      confs.foreach { case (k, _) => spark.conf.unset(k) }
    }
  }

  private def agg(): DataFrame =
    Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("q"))
      .orderBy("l_returnflag")

  test("tiny agg+sort: exchanges eliminated, result identical") {
    val before = planOf(agg())
    assert(shuffles(before) >= 1, "baseline plan should shuffle")
    val expected = before.executeCollect().map(_.toString).toSeq
    val after = withRule()(TinyExchangeElimination(before))
    assert(shuffles(after) == 0, s"rewritten plan still shuffles:\n$after")
    assert(after.executeCollect().map(_.toString).toSeq == expected)
  }

  test("shuffled self-join over tiny sides: both exchanges collapse, rows identical") {
    // exchange reuse off: the rule's real call site runs BEFORE
    // ReuseExchangeAndSubquery, so it sees two real exchanges there; the
    // test plan is post-reuse and needs the conf to reproduce that shape
    // (a post-reuse tree is skipped outright — guard covered below)
    spark.conf.set("spark.sql.exchange.reuse", "false")
    val e = Tables.events(spark, sf).select("user_id", "value")
    val joined = e.as("a").hint("shuffle_hash")
      .join(e.as("b").hint("shuffle_hash"), "user_id")
      .groupBy().count()
    val before = try planOf(joined)
    finally spark.conf.unset("spark.sql.exchange.reuse")
    assert(shuffles(before) >= 2)
    val expected = before.executeCollect()(0).getLong(0)
    val after = withRule()(TinyExchangeElimination(before))
    assert(shuffles(after) == 0, s"join exchanges survived:\n$after")
    assert(after.executeCollect()(0).getLong(0) == expected)
    // a post-reuse tree (ReusedExchange present) is never rewritten
    val reused = planOf(joined)
    if (reused.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ReusedExchangeExec]))
      assert(withRule()(TinyExchangeElimination(reused)) eq reused)
  }

  test("user repartition (fanOut intent) is never touched") {
    // a REPARTITION_BY_NUM exchange is a parallelism decision — the
    // heavy-kernel fan-out path; only the ENSURE_REQUIREMENTS exchange
    // above the aggregate may collapse
    val df = Tables.lineitem(spark, sf).repartition(3)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
    val before = planOf(df)
    val after = withRule()(TinyExchangeElimination(before))
    val reparts = after.collect {
      case e: ShuffleExchangeExec if e.shuffleOrigin == REPARTITION_BY_NUM => e
    }
    assert(reparts.size == 1, s"user repartition dropped:\n$after")
  }

  test("byte gate: over-threshold input plans unchanged") {
    val before = planOf(agg())
    val after = withRule(TinyExchangeElimination.MaxBytesKey -> "16") {
      TinyExchangeElimination(before)
    }
    assert(after eq before)
  }

  test("slice gate: a wide child (post-repartition) keeps its exchange") {
    // repartition(64) > maxSlices: the aggregate's exchange must stay —
    // collapsing it would serialize a deliberately parallel stage
    val df = Tables.lineitem(spark, sf).repartition(64)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
    val before = planOf(df)
    val after = withRule()(TinyExchangeElimination(before))
    assert(shuffles(after) == shuffles(before))
  }

  test("disabled by default / no-op under AQE") {
    val before = planOf(agg())
    SparkSession.setActiveSession(spark)
    assert(TinyExchangeElimination(before) eq before) // conf default false
    spark.conf.set(TinyExchangeElimination.EnabledKey, "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try assert(TinyExchangeElimination(before) eq before)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(TinyExchangeElimination.EnabledKey, "false")
    }
  }

  test("streaming micro-batch plans are never rewritten (state layout contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    SparkSession.setActiveSession(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Int]
    val q = in.toDF().groupBy(col("value") % 3).count()
      .writeStream.format("memory").queryName("tiny_guard")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(1 to 100: _*)
      q.processAllAvailable()
      val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      assert(shuffles(plan) >= 1)
      val after = withRule()(TinyExchangeElimination(plan))
      assert(after eq plan, "stateful stream plan must not be rewritten")
    } finally q.stop()
  }
}
