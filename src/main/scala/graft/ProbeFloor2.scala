package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: isolate per-action overhead — empty RDD job, metadata
  * count, full-column scan, agg — across repetitions.
  */
object ProbeFloor2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val sc = spark.sparkContext

    def t10(name: String)(f: => Any): Unit = {
      val ts = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"  $name: min=${ts.min}%.3f med=${ts.sorted.apply(5)}%.3f max=${ts.max}%.3f")
    }

    val li = Tables.lineitem(spark, d)
    li.count() // warm

    t10("empty rdd job (8 tasks)")(sc.parallelize(1 to 8, 8).count())
    t10("empty rdd job (32 tasks)")(sc.parallelize(1 to 32, 32).count())
    t10("li.count()")(li.count())
    t10("li.rdd-free agg sum(qty)")(li.agg(sum("l_quantity")).collect())
    t10("li full 16-col scan")(li.agg(max(length(concat_ws("|", li.columns.map(col): _*)))).collect())
    val sliced = li.select("l_quantity", "l_extendedprice")
    t10("li 2col sum")(sliced.agg(sum("l_quantity"), sum("l_extendedprice")).collect())
    val ev = Tables.events(spark, d)
    t10("events.count()")(ev.count())
    val docs = Tables.documents(spark, d)
    t10("docs.count()")(docs.count())
    // Does a pre-analyzed reused Dataset help? (count() re-plans every call)
    val cnt = li.groupBy().count()
    t10("reused agg Dataset collect")(cnt.collect())
    spark.stop()
  }
}
