package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: print the canonical GoldenHashes sha256 for the named
  * queries at sf0.01 (the correctness-gate SF), for pinning new
  * entries in [[GoldenHashes.expected]].
  */
object ProbeGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(sys.env.getOrElse("PG_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    args.foreach { n =>
      println(s"$n -> ${GoldenHashes.hashOf(SparkEntry.queries(n)(spark, sf))}")
    }
    spark.stop()
  }
}
