package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Era-immune A/B of l5's tokenize→(term,source) aggregate: OLD shape
  * (per-term row emit through the Dataset encoder, then hash agg) vs
  * NEW shape (in-kernel partition combine, vocab-bounded flush — the
  * r13 edit in TextOps). Both run alternating in ONE JVM so host-era
  * drift (BASELINE §4) cancels; downstream of g1 is vocab-sized and
  * identical, so g1 materialization is the decisive cell.
  */
object ProbeL5AB {
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

    val docs = Tables.documents(spark, d)

    def oldG1 = docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)](graft.Enc.longStrStr)
      .flatMap { case (_, src, text) =>
        graft.functions.HashOps.termCounts(text).map { case (t, c) => (src, t, c) }
      }(graft.Enc.strStrInt)
      .toDF("source", "term", "cnt")
      .groupBy("term", "source")
      .agg(sum("cnt").as("tf"), count(lit(1)).as("dfp"))

    def newG1 = docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)](graft.Enc.longStrStr)
      .mapPartitions { it =>
        val outer =
          new java.util.HashMap[String, java.util.HashMap[String, Array[Long]]]()
        var nKeys = 0
        var flushed = List.empty[Iterator[(String, String, Long, Long)]]
        def drain(): Iterator[(String, String, Long, Long)] = {
          import scala.jdk.CollectionConverters._
          val snap = outer.entrySet().iterator().asScala.flatMap { se =>
            val src = se.getKey
            se.getValue.entrySet().iterator().asScala.map { te =>
              (src, te.getKey, te.getValue()(0), te.getValue()(1))
            }
          }.toArray
          outer.clear(); nKeys = 0
          snap.iterator
        }
        it.foreach { case (_, src, text) =>
          val inner = outer.computeIfAbsent(src,
            _ => new java.util.HashMap[String, Array[Long]]())
          graft.functions.HashOps.termCounts(text).foreach { case (t, c) =>
            var acc = inner.get(t)
            if (acc == null) { acc = new Array[Long](2); inner.put(t, acc); nKeys += 1 }
            acc(0) += c; acc(1) += 1
          }
          if (nKeys > (1 << 19)) flushed ::= drain()
        }
        (drain() :: flushed).iterator.flatten
      }(graft.Enc.strStrLongLong)
      .toDF("source", "term", "tf0", "dfp0")
      .groupBy("term", "source")
      .agg(sum("tf0").as("tf"), sum("dfp0").as("dfp"))

    // warm both once, then interleave
    oldG1.count(); newG1.count()
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "6").toInt
    val olds = Array.ofDim[Double](rounds)
    val news = Array.ofDim[Double](rounds)
    for (i <- 0 until rounds) {
      var t0 = System.nanoTime()
      val no = oldG1.count()
      olds(i) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nn = newG1.count()
      news(i) = (System.nanoTime() - t0) / 1e9
      println(f"round$i  old ${olds(i)}%6.3f s (rows=$no)   new ${news(i)}%6.3f s (rows=$nn)")
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"MEDIAN old ${med(olds)}%6.3f s   new ${med(news)}%6.3f s")
    spark.stop()
  }
}
