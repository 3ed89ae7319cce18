package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev scratch: run named queries (count() action, bench config) and
  * print per-job / per-stage wall times + task counts, to see where a
  * query's time actually goes. Not part of the driver contract.
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class St(id: Int, name: String, tasks: Int, ms: Long)
    val stages = mutable.ArrayBuffer[St]()
    val jobs = mutable.ArrayBuffer[(Int, Long)]()
    val jobStart = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60), i.numTasks,
          (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L))
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs += ((j.jobId, j.time - jobStart.getOrElse(j.jobId, j.time)))
    })

    val reps = sys.env.getOrElse("PROBE_REPS", "1").toInt
    for (n <- args; _ <- 1 to reps) {
      val fn = SparkEntry.queries(n)
      fn(spark, d).count() // warm: codegen + broadcast + JIT
      spark.catalog.clearCache()
      Thread.sleep(200) // let warm-up listener events drain
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      val counted = fn(spark, d).groupBy().count()
      val qe = counted.queryExecution
      qe.executedPlan // force analysis+optimization+planning
      val tPlan = (System.nanoTime() - t0) / 1e6
      val got = counted.collect()(0).getLong(0)
      val dt = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // drain listener bus
      val phases = qe.tracker.phases.map { case (p, s) =>
        s"$p=${s.endTimeMs - s.startTimeMs}ms" }.mkString(" ")
      val jobSum = jobs.map(_._2).sum
      println(f"===== $n%s total=$dt%.0f ms plan=$tPlan%.0f ms exec=${dt - tPlan}%.0f ms jobSum=$jobSum%d ms driverGap=${dt - tPlan - jobSum}%.0f ms rows=$got%d =====")
      println(s"  phases: $phases")
      println(s"  jobs: ${jobs.map { case (id, ms) => s"#$id=${ms}ms" }.mkString(" ")}")
      stages.sortBy(_.id).foreach(s =>
        println(f"  stage ${s.id}%3d ${s.ms}%5d ms ${s.tasks}%3d tasks  ${s.name}%s"))
      spark.catalog.clearCache()
    }
    if (sys.env.get("PROBE_RULES").contains("1")) {
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      for (n <- args) { val f = SparkEntry.queries(n); f(spark, d).groupBy().count().queryExecution.executedPlan }
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    }
    spark.stop()
  }
}
