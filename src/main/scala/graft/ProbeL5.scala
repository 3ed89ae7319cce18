package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** l5 sf1 decomposition (r13 item 1): time each prefix of the TF-IDF
  * pipeline at the 10× corpus — tokenize kernel, (term,source) agg,
  * the term-window DF pass, the final ranking — to locate the 0.7 s
  * (vs DuckDB 0.1 s) before restructuring on a guess.
  */
object ProbeL5 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("PROBE_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.tinyExchange.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      for (i <- 0 until 4) {
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 0) println(f"$label%-26s pass$i $dt%7.3f s  rows=$n")
      }
    }

    val docs = Tables.documents(spark, d)
    def perDoc = docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)](graft.Enc.longStrStr)
      .flatMap { case (_, src, text) =>
        graft.functions.HashOps.termCounts(text).map { case (t, c) => (src, t, c) }
      }(graft.Enc.strStrInt)
      .toDF("source", "term", "cnt")
    def g1 = perDoc.groupBy("term", "source")
      .agg(sum("cnt").as("tf"), count(lit(1)).as("dfp"))

    time("decode only") {
      docs.select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)](graft.Enc.longStrStr)
        .map(t => t._3.length.toLong)(org.apache.spark.sql.Encoders.scalaLong)
        .reduce(_ + _)
    }
    time("tokenize, no row encode") {
      docs.select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)](graft.Enc.longStrStr)
        .map(t => graft.functions.HashOps.termCounts(t._3).size.toLong)(
          org.apache.spark.sql.Encoders.scalaLong)
        .reduce(_ + _)
    }
    time("tokenize kernel")(perDoc.count())
    time("g1 (term,source) agg")(g1.count())
    time("g1 + term window df") {
      g1.withColumn("df", sum("dfp").over(Window.partitionBy("term"))).count()
    }
    time("g1 + df via agg-join") {
      val df = g1.groupBy("term").agg(sum("dfp").as("df"))
      g1.join(df.hint("shuffle_hash"), "term").count()
    }
    time("full l5")(SparkEntry.queries("l5_tfidf_top3")(spark, d).count())
    spark.stop()
  }
}
