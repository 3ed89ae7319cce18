package graft
import org.apache.spark.sql.SparkSession
object ProbeA3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    Tables.embeddings(spark, d).count()
    def t(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"  $name: ${ts.map(_._1).min}%.3f s (rows=${ts.head._2})")
    }
    t("a3_ann_ivf")(SparkEntry.queries("a3_ann_ivf")(spark, d).count())
    spark.stop()
  }
}
