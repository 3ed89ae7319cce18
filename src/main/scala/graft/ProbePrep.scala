package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: prepared-pass cost split — clone time vs execute time
  * per pass for named queries, under the bench session config. */
object ProbePrep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "4096")
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
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      val counted = SparkEntry.queries(n)(spark, d).groupBy().count()
      val plan = counted.queryExecution.executedPlan
      Bench.freshPlan(plan).executeCollect() // warm
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val fresh = Bench.freshPlan(plan)
        val t1 = System.nanoTime()
        fresh.executeCollect()
        val t2 = System.nanoTime()
        println(f"$n%-22s clone=${(t1 - t0) / 1e6}%6.1f ms exec=${(t2 - t1) / 1e6}%7.1f ms")
      }
    }
    spark.stop()
  }
}
