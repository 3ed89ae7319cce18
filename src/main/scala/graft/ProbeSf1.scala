package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: decompose the sf1 binding laggards (q04/q05/l5/q06 —
  * BASELINE §5b) into their cost components under the exact bench
  * session, to attribute wall time to scan / broadcast build / probe /
  * shuffle before touching any plan. */
object ProbeSf1 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("PS_SF", "/tmp/graft_sf1")
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.tinyExchange.enabled", "true")
      .config("spark.sql.shuffle.partitions", "32")
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

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-34s min=${runs.map(_._1).min}%6.3fs rows=${runs.head._2}")
    }

    time("lineitem scan+project+sum") {
      Tables.lineitem(spark, d)
        .select((col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
        .agg(sum("r")).count()
    }
    time("orders 2col scan+count") {
      Tables.orders(spark, d).select("o_orderkey", "o_custkey")
        .agg(count(lit(1))).count()
    }
    time("orders broadcast build+probe1row") {
      Tables.lineitem(spark, d).limit(1).select(col("l_orderkey"))
        .join(broadcast(Tables.orders(spark, d).select("o_orderkey", "o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .count()
    }
    time("q04 full") {
      SparkEntry.queries("q04_multi_join")(spark, d).count()
    }
    time("q05 semi only") {
      Tables.orders(spark, d).select("o_orderkey")
        .join(Tables.lineitem(spark, d).filter(col("l_quantity") > 45)
          .select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("a")).count()
    }
    time("q05 anti only") {
      Tables.customer(spark, d).select("c_custkey")
        .join(Tables.orders(spark, d).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("b")).count()
    }
    time("q04 preagg+SHJ") {
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
        .groupBy("l_orderkey").agg(sum("rev0").as("rev0"))
        .join(Tables.orders(spark, d).select("o_orderkey", "o_custkey")
          .hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(round(sum("rev0"), 2).as("rev"))
        .join(broadcast(Tables.nation(spark, d)
          .select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, d).select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "rev").count()
    }
    time("q04 custkey-first") {
      // orders+customer first (small build), then ONE fact broadcast of
      // (o_orderkey, c_nationkey) — same build size, just reordered
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev0"))
        .join(broadcast(Tables.orders(spark, d)
          .select("o_orderkey", "o_custkey")
          .join(broadcast(Tables.customer(spark, d)
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "c_nationkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_nationkey").agg(round(sum("rev0"), 2).as("rev"))
        .count()
    }
    time("q05 anti via distinct") {
      Tables.customer(spark, d).select("c_custkey")
        .join(broadcast(Tables.orders(spark, d).select("o_custkey").distinct()),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("b")).count()
    }
    time("q05 semi via distinct") {
      Tables.orders(spark, d).select("o_orderkey")
        .join(broadcast(Tables.lineitem(spark, d)
          .filter(col("l_quantity") > 45).select("l_orderkey").distinct()),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("a")).count()
    }
    time("q05 semi SHJ") {
      Tables.orders(spark, d).select("o_orderkey")
        .join(Tables.lineitem(spark, d)
          .filter(col("l_quantity") > 45).select("l_orderkey")
          .hint("shuffle_hash"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("a")).count()
    }
    time("q06 full") {
      SparkEntry.queries("q06_window")(spark, d).count()
    }
    time("l5 full") {
      SparkEntry.queries("l5_tfidf_top3")(spark, d).count()
    }
    time("documents scan+tokenize") {
      Tables.documents(spark, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .agg(count(lit(1))).count()
    }
    time("l5 kernel+partial-agg only") {
      import spark.implicits._
      Tables.documents(spark, d).select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)](graft.Enc.longStrStr)
        .flatMap { case (_, src, text) =>
          graft.functions.HashOps.termCounts(text).map { case (t, c) => (src, t, c) }
        }(graft.Enc.strStrInt)
        .toDF("source", "term", "cnt")
        .groupBy("term", "source")
        .agg(sum("cnt").as("tf"), count(lit(1)).as("dfp"))
        .agg(count(lit(1))).count()
    }
    time("l5 in-kernel combine") {
      import spark.implicits._
      Tables.documents(spark, d).select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)](graft.Enc.longStrStr)
        .mapPartitions { it =>
          val m = new java.util.HashMap[(String, String), Array[Long]]()
          it.foreach { case (_, src, text) =>
            graft.functions.HashOps.termCounts(text).foreach { case (t, c) =>
              val k = (src, t)
              val v = m.get(k)
              if (v == null) m.put(k, Array(c.toLong, 1L))
              else { v(0) += c; v(1) += 1 }
            }
          }
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala.map { e =>
            (e.getKey._1, e.getKey._2, e.getValue()(0), e.getValue()(1))
          }
        }
        .toDF("source", "term", "tf", "dfp")
        .groupBy("term", "source")
        .agg(sum("tf").as("tf"), sum("dfp").as("dfp"))
        .agg(count(lit(1))).count()
    }
    time("l5 kernel scan only") {
      import spark.implicits._
      Tables.documents(spark, d).select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)](graft.Enc.longStrStr)
        .flatMap { case (_, src, text) =>
          graft.functions.HashOps.termCounts(text).map { case (t, c) => (src, t, c) }
        }(graft.Enc.strStrInt)
        .toDF("source", "term", "cnt")
        .agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
