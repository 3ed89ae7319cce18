package graft
import org.apache.spark.sql.SparkSession
object ProbeSketch {
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
    Tables.documents(spark, d).count(); Tables.embeddings(spark, d).count()
    def t(name: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ => val t0 = System.nanoTime(); val n = f; spark.catalog.clearCache(); ((System.nanoTime()-t0)/1e9, n) }
      println(f"  $name: ${ts.map(_._1).min}%.3f s (rows=${ts.head._2})")
    }
    for (n <- Seq("t3_langid_confusion", "d1_minhash_neardup", "d2_simhash_neardup",
                  "d3_embedding_neardup", "a2_ann_lsh", "a1_ann_exact", "l3_cosine_topk"))
      t(n)(SparkEntry.queries(n)(spark, d).count())
    spark.stop()
  }
}
