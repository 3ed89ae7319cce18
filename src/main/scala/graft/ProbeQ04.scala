package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (r11): re-A/B q04's fact-join strategy in the current
  * host era. Variants: (a) the shipped plan — order-grain pre-agg
  * riding the fact exchange + shuffle_hash fact join; (b) broadcast
  * orders, NO fact exchange at all (join-then-aggregate straight to
  * the 25 groups); (c) broadcast orders over the order-grain pre-agg
  * (one fact exchange, no second). min-of-N after warm-up, variants
  * interleaved so a host phase cannot favor one.
  *
  * Result (2026-08-14, n=12, quiet host): shipped min/med
  * 0.378/0.420 s; bcast-no-preagg 0.421/0.561; bcast-preagg
  * 0.409/0.485 — the r5/r6 strategy choice HOLDS in the current host
  * era; q04's residual gap to same-day DuckDB is single-row-group
  * scan per-core efficiency, not join strategy (BASELINE.md §4).
  */
object ProbeQ04 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def dims = Tables.customer(spark, d)
      .select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, d)
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d).select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")

    def shipped = SparkEntry.queries("q04_multi_join")(spark, d)

    def bcastNoPre = Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
      .join(broadcast(Tables.orders(spark, d).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum("rev0"), 2).as("rev"))
      .orderBy("r_name", "n_name")

    def bcastPre = Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
      .groupBy("l_orderkey").agg(sum("rev0").as("rev0"))
      .join(broadcast(Tables.orders(spark, d).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum("rev0"), 2).as("rev"))
      .orderBy("r_name", "n_name")

    val variants = Seq(
      "shipped(shj+preagg)" -> (() => shipped),
      "bcast-no-preagg    " -> (() => bcastNoPre),
      "bcast-preagg       " -> (() => bcastPre))
    // warm
    variants.foreach { case (_, f) => f().count(): Unit }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to n; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f().count(): Unit
      times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
      spark.catalog.clearCache()
    }
    for ((name, _) <- variants) {
      val ts = times(name).sorted
      println(f"$name min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
