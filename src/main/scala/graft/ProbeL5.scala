package graft
import org.apache.spark.sql.SparkSession
object ProbeL5 {
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
    Tables.documents(spark, d).count()
    def t(name: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ => val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"  $name: ${ts.map(_._1).min}%.3f s (rows=${ts.head._2})")
    }
    t("l5 aqe-off")(SparkEntry.queries("l5_tfidf_top3")(spark, d).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t("l5 aqe-on")(SparkEntry.queries("l5_tfidf_top3")(spark, d).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("l2 aqe-off")(SparkEntry.queries("l2_jaccard_pairs")(spark, d).count())
    spark.stop()
  }
}
