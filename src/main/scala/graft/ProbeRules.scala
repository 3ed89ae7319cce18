package graft
import org.apache.spark.sql.SparkSession
object ProbeRules {
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
    Tables.lineitem(spark, d).count()
    // warm one pass, then reset metrics and measure a clean pass
    for (n <- Seq("q02_hash_agg", "q05_semi_anti", "q04_multi_join")) 
      SparkEntry.queries(n)(spark, d).count()
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val t0 = System.nanoTime()
    for (n <- Seq("q02_hash_agg", "q05_semi_anti", "q04_multi_join"))
      SparkEntry.queries(n)(spark, d).count()
    println(f"3 queries: ${(System.nanoTime()-t0)/1e9}%.3f s")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
