package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-query A/B of TinyExchangeElimination under the
  * bench session (rule OFF vs ON in the same JVM — conf is read at
  * planning time, so toggling re-plans). Reports min/median wall,
  * exchange counts in the executed plan, and a sorted-result equality
  * check. Not part of the driver contract.
  */
object ProbeTiny {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PASSES", "7").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
      .getOrElse(Seq("q01_filter_project", "q02_hash_agg", "q03_join_agg",
        "q04_multi_join", "q05_semi_anti", "q06_window", "q07_topk",
        "q08_rollup", "q09_set_intersect", "q10_string_math",
        "q11_date_scalars", "q12_json", "q13_range_join", "q14_percentiles",
        "q15_corr_subquery", "s1_tumbling_window", "s2_sliding_window",
        "s3_session_windows", "s5_dedup", "l1_exact_dedup",
        "l2_jaccard_pairs", "l4_text_stats", "l5_tfidf_top3"))
    val defs = SparkEntry.allDefs.filter(qd => names.contains(qd.name))

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      }.sum

    def time(qd: QueryDef): (Double, Double) = {
      qd.fn(spark, d).count(); qd.fn(spark, d).count() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        qd.fn(spark, d).count()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      spark.catalog.clearCache()
      (ts.head, ts(ts.size / 2))
    }

    def rows(qd: QueryDef): Seq[String] =
      qd.fn(spark, d).collect().map(_.toString).sorted.toSeq

    println(f"${"query"}%-22s ${"offMin"}%8s ${"offMed"}%8s ${"onMin"}%8s ${"onMed"}%8s  exOff exOn same")
    var totOff = 0.0; var totOn = 0.0
    defs.foreach { qd =>
      spark.conf.set("spark.graft.tinyExchange.enabled", "false")
      val exOff = exchanges(qd.fn(spark, d))
      val rOff = rows(qd)
      val (offMin, offMed) = time(qd)
      spark.conf.set("spark.graft.tinyExchange.enabled", "true")
      val exOn = exchanges(qd.fn(spark, d))
      val rOn = rows(qd)
      val (onMin, onMed) = time(qd)
      val same = rOff == rOn
      totOff += offMin; totOn += onMin
      println(f"${qd.name}%-22s $offMin%8.1f $offMed%8.1f $onMin%8.1f $onMed%8.1f  $exOff%4d $exOn%4d $same")
    }
    println(f"TOTAL(min) off=$totOff%8.1f ms  on=$totOn%8.1f ms")
    spark.stop()
  }
}
