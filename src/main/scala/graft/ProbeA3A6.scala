package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: do a3 (IVF) and a6 (PQ) return EXACTLY a1's exact
  * top-k at the gate/bench SFs, and at which (nProbe / rerank) dials?
  * The a2 promotion path (VERDICT r13 item 2): dial the candidate set
  * until it provably covers the exact top-5, with margin, then share
  * a1's oracle. */
object ProbeA3A6 {
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
      // a3: measured r14 — nProbe 8/10/12 miss (rowDiffs 4–27 across
      // SFs), 14 EXACT at all three SFs, 16 = probe-all; entry pins 15
      for (np <- Seq(8, 10, 12, 14, 16)) {
        val a3 = graft.queries.SimilarityOps.annIvf(
          Tables.embeddings(spark, sf), nProbe = np).collect()
          .map(_.toSeq).toSeq
        val diff = a1.zip(a3).count { case (x, y) => x != y }
        println(s"$sf a3 nProbe=$np: rowDiffs=$diff equal=${a1 == a3}")
      }
      // a6: measured r14 — (8,64,10k/20k/50k/100k) all miss at sf0.1;
      // (8,64,200k) exact but shortlist-heavy; (16,64,20k) EXACT at
      // all three SFs (ADC tight at 4-d subspaces); entry pins
      // (16,64,50k) for 2.5× margin
      for ((m, cc, rr) <- Seq((8, 64, 200), (8, 256, 20), (8, 256, 50),
          (16, 64, 20), (16, 64, 50), (16, 256, 20), (16, 256, 50))) {
        val a6 = graft.queries.SimilarityOps.annPq(
          Tables.embeddings(spark, sf), m = m, codeCount = cc,
          rerankFactor = rr).collect()
          .map(_.toSeq).toSeq
        val diff = a1.zip(a6).count { case (x, y) => x != y }
        println(s"$sf a6 m=$m cc=$cc rerank=${rr}k: rowDiffs=$diff equal=${a1 == a6}")
      }
    }
    spark.stop()
  }
}
