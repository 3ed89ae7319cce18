package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev scratch: decompose the per-query floor at sf0.1 — scan decode,
  * agg stages, final-sort elimination under count(), join strategies.
  */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import QueryDef._

    def t(name: String)(f: => Long): Unit = {
      // min of 3 (VM noise)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"  $name: ${ts.min}%.3f s")
    }

    val li = Tables.lineitem(spark, d)
    // warm
    li.count(); Tables.orders(spark, d).count(); Tables.customer(spark, d).count()

    t("li raw count")(li.count())
    t("li 7col sum")(li.agg(sum("l_quantity")).count())
    val q02body = li
      .filter(col("l_shipdate") <= ts_("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
    t("q02 no sort")(q02body.count())
    t("q02 orderBy")(q02body.orderBy("l_returnflag", "l_linestatus").count())
    t("q02 orderedSmall")(q02body.orderedSmall(col("l_returnflag"), col("l_linestatus")).count())

    // q04 variants
    val o = Tables.orders(spark, d); val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d); val r = Tables.region(spark, d)
    def q04(hint: String) = {
      val oh = if (hint.isEmpty) o.select("o_orderkey", "o_custkey")
        else o.select("o_orderkey", "o_custkey").hint(hint)
      val ch = if (hint.isEmpty) c.select("c_custkey", "c_nationkey")
        else c.select("c_custkey", "c_nationkey").hint(hint)
      li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(oh, col("l_orderkey") === col("o_orderkey"))
        .join(ch, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.select("n_nationkey", "n_name", "n_regionkey")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r.select("r_regionkey", "r_name")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("rev"))
    }
    t("q04 aqe-default")(q04("").count())
    t("q04 broadcast-hint")(q04("broadcast").count())
    t("q04 shuffle-hash")(q04("shuffle_hash").count())
    t("q04 merge")(q04("merge").count())

    // q06 window
    val q06 = SparkEntry.queries("q06_window")
    t("q06 as-is")(q06(spark, d).count())
    // q12 json
    t("q12 as-is")(SparkEntry.queries("q12_json")(spark, d).count())
    t("q15 as-is")(SparkEntry.queries("q15_corr_subquery")(spark, d).count())
    t("q08 as-is")(SparkEntry.queries("q08_rollup")(spark, d).count())
    spark.stop()
  }
  private def ts_(s: String) = to_timestamp(lit(s))
}
