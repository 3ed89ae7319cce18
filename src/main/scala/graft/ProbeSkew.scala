package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE skew-join probe: plants one hot join key and prints the final
  * adaptive plan so the skew-split behavior (AQEShuffleRead skewed vs
  * coalesced) can be verified under explicit thresholds — the second
  * layer of the engine's skew story (deterministic salting, d1b, is
  * the first). Knobs via args: [threshold] [factor] [force]. */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val thr = args.headOption.getOrElse("65536")
    val factor = args.lift(1).getOrElse("2")
    val force = args.lift(2).contains("force")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", thr)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", factor)
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", force.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // varied payload so shuffle compression cannot flatten the hot key
    val left = (0 until 300000)
      .map(i => (if (i % 3 == 0) 0L else (i % 99999).toLong + 1,
        f"payload-$i-${i * 2654435761L}%096d"))
      .toDF("k", "v").repartition(8)
    val right = (0L until 100000L).map(k => (k, s"p$k")).toDF("k", "p")
    val g = left.join(right, "k")
      .agg(count(lit(1)).as("n"), sum(length(col("v"))).as("chars"))
    println("RESULT " + g.collect().mkString(","))
    val plan = g.queryExecution.executedPlan.toString
    println("SKEWED_IN_PLAN " + plan.contains("skew=true"))
    println(plan.linesIterator.filter(l =>
      l.contains("AQEShuffleRead") || l.contains("SortMergeJoin")).mkString("\n"))
    spark.stop()
  }
}
