package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: inspect how Spark reads the driver-generated parquet. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("events", "orders", "embeddings", "documents")) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      println(s"== $t ==")
      df.printSchema()
      df.show(3, truncate = false)
    }
    spark.stop()
  }
}
