package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.GraphOps

/** Dev scratch: phase timing for g1/g2 (edge build, degree, PageRank
  * loop, triangle join) at a given SF, to locate the wall before
  * dialing the plans. Not part of the driver contract.
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "on") == "on"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.tinyExchange.enabled", (!aqe).toString)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = Tables.lineitem(spark, d)
    t("edge build (cold)") {
      println(s"[probe]   edges=${GraphOps.coPurchaseEdges(li).count()}")
    }
    t("edge build (warm)") {
      println(s"[probe]   edges=${GraphOps.coPurchaseEdges(li).count()}")
    }
    t("edge build JOIN twin (cold)") {
      println(s"[probe]   edges=${GraphOps.coPurchaseEdgesJoin(li).count()}")
    }
    t("edge build JOIN twin (warm)") {
      println(s"[probe]   edges=${GraphOps.coPurchaseEdgesJoin(li).count()}")
    }
    t("agg == join edge sets") {
      val j = GraphOps.coPurchaseEdgesJoin(li)
      val g = GraphOps.coPurchaseEdges(li)
      val d1 = j.exceptAll(g).count(); val d2 = g.exceptAll(j).count()
      println(s"[probe]   except=$d1/$d2")
    }
    for (pass <- 1 to 3) {
      t(s"g1 entry pass $pass") {
        GraphOps.pagerank(GraphOps.coPurchaseEdges(li), 5, 100).count()
      }
    }
    for (pass <- 1 to 3) {
      t(s"g2 entry pass $pass") {
        GraphOps.triangleCounts(GraphOps.coPurchaseEdges(li), 100).count()
      }
    }
    // fast-path sub-phases
    val e0 = GraphOps.coPurchaseEdges(li).cache()
    t("fp count") { e0.count() }
    val es = t("fp collect") {
      import spark.implicits._
      e0.select(col("src"), col("dst")).as[(Long, Long)].collect()
    }
    val eS = es.map(_._1)
    val eD = es.map(_._2)
    t("fp driverPagerank") { GraphOps.driverPagerank(spark, eS, eD, 5, 100).count() }
    t("fp driverPagerank 2") { GraphOps.driverPagerank(spark, eS, eD, 5, 100).count() }
    t("fp driverTriangles") { GraphOps.driverTriangles(spark, eS, eD, 100).count() }
    t("fp driverTriangles 2") { GraphOps.driverTriangles(spark, eS, eD, 100).count() }
    t("fp driverBfs") { GraphOps.driverBfs(spark, eS, eD, 3, 6).count() }
    t("fp driverBfs 2") { GraphOps.driverBfs(spark, eS, eD, 3, 6).count() }
    t("fp driverCommonNeighbors") {
      GraphOps.driverCommonNeighbors(spark, eS, eD, 20, 5).count()
    }
    t("fp driverCommonNeighbors 2") {
      GraphOps.driverCommonNeighbors(spark, eS, eD, 20, 5).count()
    }
    for (pass <- 1 to 3) {
      t(s"g3 entry pass $pass") {
        GraphOps.bfsHops(GraphOps.coPurchaseEdges(li), 3, 6).count()
      }
    }
    for (pass <- 1 to 3) {
      t(s"g4 entry pass $pass") {
        GraphOps.commonNeighbors(GraphOps.coPurchaseEdges(li), 20, 5).count()
      }
    }
    spark.stop()
  }
}
