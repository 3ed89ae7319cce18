package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: time one query repeatedly. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (name <- args; i <- 1 to 5) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
