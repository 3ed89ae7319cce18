package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: steady-state driver/job latency floor under the bench
  * session config — how much of a sub-second query is scheduling, not
  * work. Not part of the driver contract.
  */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def bench(name: String, reps: Int)(f: => Unit): Unit = {
      f; f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-40s min=${ts.min}%7.1f ms  med=${ts.sorted.apply(reps / 2)}%7.1f ms")
    }

    bench("rdd 8-task count", 10) { sc.parallelize(1 to 8, 8).count(): Unit }
    bench("rdd 1-task count", 10) { sc.parallelize(1 to 8, 1).count(): Unit }
    bench("rdd 2-stage shuffle count", 10) {
      sc.parallelize(1 to 8, 8).map(x => (x, x)).reduceByKey(_ + _, 8).count(): Unit
    }
    bench("sql range 1e6 sum collect", 10) {
      spark.range(1000000).selectExpr("sum(id)").collect(): Unit
    }
    bench("sql range fresh-df sum collect", 10) {
      spark.range(1000000).toDF("id").selectExpr("sum(id) as s").collect(): Unit
    }
    bench("lineitem scan count (cached df)", 6) {
      Tables.lineitem(spark, d).count(): Unit
    }
    bench("lineitem 2col agg collect", 6) {
      Tables.lineitem(spark, d)
        .selectExpr("sum(l_quantity) q", "sum(l_extendedprice) e")
        .collect(): Unit
    }
    bench("events scan count", 6) { Tables.events(spark, d).count(): Unit }
    spark.stop()
  }
}
