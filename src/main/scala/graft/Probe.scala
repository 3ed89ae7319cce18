package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratch: drive the streaming surface end-to-end. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1) streaming CDC from a drop directory, two files arriving apart
    val dir = java.nio.file.Files.createTempDirectory("probe_drop")
    val cp = java.nio.file.Files.createTempDirectory("probe_cp")
    val q = streaming.CdcStream.start(spark, dir.toString,
      cdc.Catalog.fixture(spark), cdc.CdcConfig(), cp.toString) { (batch, id) =>
      val rows = batch.select("sql").collect().map(_.getString(0))
      println(s"[cdc-batch $id] ${rows.size} stmts; first=" +
        rows.headOption.map(_.linesIterator.toList.last).getOrElse("-"))
    }
    java.nio.file.Files.writeString(dir.resolve("b1.txt"),
      cdc.BinlogFixture.representative)
    q.processAllAvailable()
    java.nio.file.Files.writeString(dir.resolve("b2.txt"),
      cdc.BinlogFixture.pkChangingUpdate)
    q.processAllAvailable()
    q.stop()

    // 2) windowed agg over a streamed copy of the real events table
    val evDir = java.nio.file.Files.createTempDirectory("probe_ev")
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(evDir.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(evDir.toString).schema)
      .parquet(evDir.toString)
    val agg = streaming.StreamingOps.tumbling(stream)
    val wq = agg.writeStream.format("memory").queryName("probe_tumble")
      .outputMode("append").start()
    wq.processAllAvailable(); wq.stop()
    println("[tumbling] closed windows: " + spark.table("probe_tumble").count())
    spark.table("probe_tumble").orderBy("w", "event_type").show(5, false)
    spark.stop()
  }
}
