package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch: dump the formatted plan of named queries at sf0.1. */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "false"))
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // PROBE_COUNT=1: show the plan the bench actually executes
    // (count() over the query), not the bare query plan.
    val asCount = sys.env.get("PROBE_COUNT").contains("1")
    for (n <- args) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, d)
      (if (asCount) df.groupBy().count() else df).explain("formatted")
    }
    spark.stop()
  }
}
