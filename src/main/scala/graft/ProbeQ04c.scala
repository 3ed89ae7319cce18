package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q04 sf1 decomposition (r13 item 1): under the bench session,
  * time each prefix of q04's pipeline at the 10× corpus to locate
  * where the 0.8 s (vs DuckDB's 0.1 s) actually goes — scan,
  * orders-join build/probe, customer probe, or the aggregate —
  * before restructuring anything on a guess.
  */
object ProbeQ04c {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("PROBE_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.tinyExchange.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      for (i <- 0 until 4) {
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 0) println(f"$label%-28s pass$i $dt%7.3f s  rows=$n")
      }
    }

    val li = () => Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
    val ord = () => Tables.orders(spark, d).select("o_orderkey", "o_custkey")

    time("scan lineitem 2col")(li().count())
    time("scan orders 2col")(ord().count())
    time("orders executeCollect") {
      ord().queryExecution.executedPlan.executeCollect().length.toLong
    }
    time("bcast-build orders only") {
      // isolate the broadcast build: join a 1-row probe side
      li().limit(1).join(broadcast(ord()),
        col("l_orderkey") === col("o_orderkey"), "left").count()
    }
    time("li JOIN bcast(orders)")(li().join(broadcast(ord()),
      col("l_orderkey") === col("o_orderkey")).count())
    time("li JOIN orders hintless")(li().join(ord(),
      col("l_orderkey") === col("o_orderkey")).count())
    time("full q04")(SparkEntry.queries("q04_multi_join")(spark, d).count())

    // candidate shape: map-side pre-agg to order grain (6M -> 1.5M,
    // combined in the scan task), then a PARALLEL-build shuffle join
    // with orders — the build DuckDB parallelizes and a driver-side
    // broadcast build serializes.
    def preAggShj(): Long = {
      val rev = li().groupBy("l_orderkey").agg(sum("rev0").as("rev1"))
      val j = rev.join(ord().hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(sum("rev1").as("rev"))
      j.count()
    }
    time("preagg + SHJ orders")(preAggShj())
    spark.stop()
  }
}
