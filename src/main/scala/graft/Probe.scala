package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: time the baseline set under different session configs.
  * args: [aqe] [parts] [compress] [query names...]; min-of-3 interleaved
  * passes per query (the host VM has multi-second contention bursts).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val parts = args.lift(1).getOrElse("8")
    val compress = args.lift(2).getOrElse("true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.shuffle.compress", compress)
      .config("spark.shuffle.spill.compress", compress)
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val baseline = Set(
      "q01_filter_project", "q02_hash_agg", "q03_join_agg", "q04_multi_join",
      "q05_semi_anti", "q06_window", "q07_topk", "q08_rollup",
      "q09_set_intersect", "q10_string_math", "q11_date_scalars", "q12_json",
      "q13_range_join", "q14_percentiles", "q15_corr_subquery",
      "s1_tumbling_window", "s2_sliding_window", "s3_session_windows",
      "s5_dedup", "l1_exact_dedup", "l2_jaccard_pairs", "l3_cosine_topk",
      "l4_text_stats", "l5_tfidf_top3")
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.allDefs.map(_.name).filter(baseline)
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    names.foreach(once) // warm pass
    val passes = (1 to 3).map(_ => names.map(n => n -> once(n)).toMap)
    var total = 0.0
    for (n <- names) {
      val best = passes.map(_(n)).min
      println(f"  $n: $best%.3f s")
      total += best
    }
    println(f"[aqe=$aqe parts=$parts compress=$compress] total: $total%.2f s over ${names.size} queries")
    spark.stop()
  }
}
