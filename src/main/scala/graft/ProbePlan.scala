package graft
import org.apache.spark.sql.SparkSession
object ProbePlan {
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
    Tables.lineitem(spark, d).count()
    for (n <- Seq("q02_hash_agg", "q05_semi_anti", "q12_json")) {
      // warm
      SparkEntry.queries(n)(spark, d).count()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, d)
      val t1 = System.nanoTime()
      val cnt = df.groupBy().count()
      val qe = cnt.queryExecution
      qe.assertAnalyzed()
      val t2 = System.nanoTime()
      val _ = qe.optimizedPlan
      val t3 = System.nanoTime()
      val rdd = qe.toRdd  // physical planning + codegen prep
      val t4 = System.nanoTime()
      rdd.count()
      val t5 = System.nanoTime()
      rdd.count()
      val t6 = System.nanoTime()
      println(f"  $n: build=${(t1-t0)/1e6}%.0f analyze=${(t2-t1)/1e6}%.0f optimize=${(t3-t2)/1e6}%.0f plan+toRdd=${(t4-t3)/1e6}%.0f exec1=${(t5-t4)/1e6}%.0f exec2=${(t6-t5)/1e6}%.0f ms")
      println("    tracker: " + qe.tracker.phases.map { case (k, v) => s"$k=${v.durationMs}ms" }.mkString(" "))
    }
    spark.stop()
  }
}
