package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: print the formatted physical plan for the named
  * queries at a given SF dir (default sf0.01) under a bench-like
  * session — for auditing exchange counts, pushed filters, and
  * codegen spans per operator.
  */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PE_SF", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
