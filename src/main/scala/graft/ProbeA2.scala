package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: does a2 (LSH ANN at the pinned parameters) return
  * EXACTLY a1's exact top-k at the gate/bench SFs? If yes at every
  * driver-checked SF, a2 can share a1's oracle (VERDICT r12 item 6). */
object ProbeA2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val a1 = SparkEntry.queries("a1_ann_exact")(spark, sf).collect()
        .map(_.toSeq).toSeq
      for (nb <- Seq(8, 16, 24, 32)) {
        val a2 = graft.queries.SimilarityOps.annLsh(
          Tables.embeddings(spark, sf), nBands = nb).collect()
          .map(_.toSeq).toSeq
        val diff = a1.zip(a2).count { case (x, y) => x != y }
        println(s"$sf nBands=$nb: rowDiffs=$diff equal=${a1 == a2}")
      }
    }
    spark.stop()
  }
}
