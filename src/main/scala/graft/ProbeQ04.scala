package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ProbeQ04 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ => val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"  $name: ${ts.map(_._1).min}%.3f s (rows=${ts.head._2})")
    }
    val li = Tables.lineitem(spark, d); val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d); val n = Tables.nation(spark, d); val r = Tables.region(spark, d)
    li.count(); o.count(); c.count(); n.count(); r.count()
    def custNation = c.select("c_custkey", "c_nationkey")
      .join(broadcast(n.select("n_nationkey", "n_name", "n_regionkey")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r.select("r_regionkey", "r_name")), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
    t("as-is")(SparkEntry.queries("q04_multi_join")(spark, d).count())
    // A: repartition fact before broadcast joins
    def vA(parts: Int) = li.select("l_orderkey", "l_extendedprice", "l_discount")
      .repartition(parts)
      .join(broadcast(o.select("o_orderkey", "o_custkey")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("rev"))
      .orderBy("r_name", "n_name")
    t("A repart32 fact")(vA(32).count())
    t("A repart8 fact")(vA(8).count())
    // B: pre-agg fact by orderkey, shuffle joins, broadcast only dims
    def vB = {
      val liAgg = li.select("l_orderkey", "l_extendedprice", "l_discount")
        .groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev0"))
      liAgg.join(o.select("o_orderkey", "o_custkey").hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("rev0").as("rev1"))
        .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name").agg(round(sum("rev1"), 2).as("rev"))
        .orderBy("r_name", "n_name")
    }
    t("B preagg+shuffle")(vB.count())
    spark.stop()
  }
}
