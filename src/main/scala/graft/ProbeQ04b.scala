package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: q04 plan variants under the r12 tiny-exchange bench
  * session (single-slice inputs ⇒ exchange-free pipelines) — the
  * pre-agg + SHJ structure was tuned for the exchange-ful plan; this
  * re-checks it against straight probe pipelines. */
object ProbeQ04b {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.tinyExchange.enabled", "true")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def current(): DataFrame =
      SparkEntry.queries("q04_multi_join")(spark, d)

    // B: no order-grain pre-agg — lineitem streams straight into the
    // SHJ on orderkey, then the dim chain
    def variantB(): DataFrame =
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
        .join(Tables.orders(spark, d).select("o_orderkey", "o_custkey")
          .hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(round(sum("rev0"), 2).as("rev"))
        .join(broadcast(Tables.nation(spark, d)
          .select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, d).select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "rev")
        .coalesce(1).sortWithinPartitions("r_name", "n_name")

    // C: all-broadcast — lineitem scan probes orders/customer builds
    // (built concurrently on the driver side), single codegen pipeline
    def variantC(): DataFrame =
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
        .join(broadcast(Tables.orders(spark, d).select("o_orderkey", "o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(round(sum("rev0"), 2).as("rev"))
        .join(broadcast(Tables.nation(spark, d)
          .select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, d).select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "rev")
        .coalesce(1).sortWithinPartitions("r_name", "n_name")

    // D: pre-agg kept, orders broadcast (order-grain stream probes)
    def variantD(): DataFrame =
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
        .groupBy("l_orderkey").agg(sum("rev0").as("rev0"))
        .join(broadcast(Tables.orders(spark, d).select("o_orderkey", "o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(round(sum("rev0"), 2).as("rev"))
        .join(broadcast(Tables.nation(spark, d)
          .select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, d).select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "rev")
        .coalesce(1).sortWithinPartitions("r_name", "n_name")

    // E: C but HINTLESS on the orders join — the scale-honest form if
    // the planner picks the orders side to broadcast at bench SF
    def variantE(): DataFrame =
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
        .join(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(round(sum("rev0"), 2).as("rev"))
        .join(broadcast(Tables.nation(spark, d)
          .select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, d).select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "rev")
        .coalesce(1).sortWithinPartitions("r_name", "n_name")

    println("E plan (hintless orders join):")
    variantE().queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        println(s"  BHJ buildSide=${j.buildSide} keys=${j.leftKeys.mkString(",")}")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        println(s"  SHJ buildSide=${j.buildSide}")
    }: Unit

    val variants = Seq("current" -> (() => current()),
      "E_hintless" -> (() => variantE()),
      "B_noPreagg_shj" -> (() => variantB()),
      "C_allBroadcast" -> (() => variantC()),
      "D_preagg_bcast" -> (() => variantD()))
    // result equality first
    val ref = current().collect().map(_.toString).toSeq
    variants.foreach { case (n, f) =>
      assert(f().collect().map(_.toString).toSeq == ref, s"$n differs") }
    val reps = 9
    for (pass <- 1 to 2; (n, f) <- variants) {
      f().count(); f().count()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[pass$pass] $n%-16s min=${ts.head}%7.1f med=${ts(reps / 2)}%7.1f")
    }
    spark.stop()
  }
}
