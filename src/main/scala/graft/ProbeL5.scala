package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** l5 sf1 decomposition (r13 item 1): time each prefix of the TF-IDF
  * pipeline at the 10× corpus — tokenize kernel, (term,source) agg,
  * the term-window DF pass, the final ranking — to locate the 0.7 s
  * (vs DuckDB 0.1 s) before restructuring on a guess.
  *
  * r14 re-measure of the SHIPPED combined-kernel pipeline: pure
  * decode+tokenize 0.17 s; combined kernel (nested-map in-kernel
  * combine + 194k-row encode = vocab × partitions) 0.51 s; + agg
  * 0.63 s; + term window 0.64 s; full entry 0.90 s. The remaining
  * spread is ~0.2 s of combine-map work riding the tokenize pass and
  * ~0.26 s of tiny-stage scheduling on the 6,200-row tail (already
  * minimized by TinyExchangeElimination) — no single lever left
  * bigger than ~0.2 s, and the kernel's encoder traffic is already
  * vocabulary-bounded. Parked unless the sf1 bar reopens WIDE.
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

    // r14: prefixes of the ACTUAL combined-kernel pipeline
    def combined = {
      val docs2 = Tables.documents(spark, d)
      docs2.select(col("doc_id"), col("source"), col("text"))
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
    }
    time("combined kernel")(combined.count())
    def g1c = combined.groupBy("term", "source")
      .agg(sum("tf0").as("tf"), sum("dfp0").as("dfp"))
    time("combined + agg")(g1c.count())
    time("combined + agg + window") {
      g1c.withColumn("df", sum("dfp").over(Window.partitionBy("term"))).count()
    }
    spark.stop()
  }
}
