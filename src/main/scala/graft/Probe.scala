package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: time the baseline set with/without AQE. */
object Probe {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.allDefs.map(_.name).filter(n =>
        n.startsWith("q") || n.startsWith("s") || n.startsWith("l"))
    // warm pass
    names.foreach(n => SparkEntry.queries(n)(spark, d).count())
    spark.catalog.clearCache()
    var total = 0.0
    for (n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $n: $dt%.2f s")
      total += dt
      spark.catalog.clearCache()
    }
    println(f"[aqe=$aqe parts=$parts] baseline-ish total: $total%.2f s over ${names.size} queries")
    spark.stop()
  }
}
