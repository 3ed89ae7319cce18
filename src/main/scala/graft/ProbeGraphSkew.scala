package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.GraphOps

/** Skew-bomb evidence for the graph family (VERDICT r14 item 7).
  *
  * The g2 orientation claim — (deg, id)-oriented wedge generation
  * bounds per-vertex candidate work at O(√m) where a naive
  * neighbor self-join detonates on the hub — is proven on TPC-H's
  * schema-bounded co-purchase graph, whose degrees are capped by
  * order size. This probe plants the graph that claim is actually
  * about: a synthetic power-law tail plus ONE hub of degree H, swept
  * at 1× / 10× (default H = 10,000 and 100,000), and measures
  * head-to-head:
  *
  *   naive  — wedges from the symmetric-adjacency self-join at every
  *            center (the shape a straightforward 2-hop/triangle
  *            query writes): the hub alone contributes H·(H−1)/2
  *            pairs, all out of the ONE task that owns its join key;
  *   orient — the engine's oriented generation (the exact wedge step
  *            of `GraphOps.distributedTriangles`): every wedge
  *            materializes at its rank-LOWEST vertex, so the hub —
  *            rank-highest by construction — centers nothing and its
  *            H edges spread as wedge HEADS across their low-degree
  *            tails.
  *
  * Printed per shape: wedge count, wall seconds, total shuffle
  * read+write bytes, and the longest single task (the straggler the
  * hub key creates). The full triangle close (wedges ⋈ edges) runs
  * on both shapes at 1× — naive must equal 3× oriented (each
  * triangle found at all three corners vs exactly once) — and on the
  * oriented shape only at 10×: the naive close would shuffle the
  * hub's multi-billion-row wedge stream (reported analytically;
  * enable SPARK_GRAFT_NAIVE_FULL=on to run it anyway).
  *
  * Env knobs: SPARK_GRAFT_HUBS (csv, default "10000,100000"),
  * SPARK_GRAFT_TAIL_NODES (50000), SPARK_GRAFT_TAIL_EDGES (200000),
  * SPARK_GRAFT_CPUS (8). Not part of the driver contract.
  */
object ProbeGraphSkew {

  private final class Metrics extends SparkListener {
    val write = new AtomicLong(0L)
    val read = new AtomicLong(0L)
    val maxTaskMs = new AtomicLong(0L)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        maxTaskMs.accumulateAndGet(m.executorRunTime, math.max(_, _))
      }
    }
    def reset(): Unit = { write.set(0); read.set(0); maxTaskMs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val hubs = sys.env.getOrElse("SPARK_GRAFT_HUBS", "10000,100000")
      .split(",").map(_.trim.toLong).toSeq
    val tailNodes = sys.env.getOrElse("SPARK_GRAFT_TAIL_NODES", "50000").toLong
    val tailEdges = sys.env.getOrElse("SPARK_GRAFT_TAIL_EDGES", "200000").toLong
    val naiveFull = sys.env.getOrElse("SPARK_GRAFT_NAIVE_FULL", "off") == "on"

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    def measured(label: String)(job: => Long): Long = {
      metrics.reset()
      val t0 = System.nanoTime()
      val n = job
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let the async listener bus drain
      println(f"[skew] $label%-22s rows=$n%,15d  wall=$wall%8.2f s  " +
        f"shufW=${metrics.write.get / 1e6}%9.1f MB  " +
        f"shufR=${metrics.read.get / 1e6}%9.1f MB  " +
        f"maxTask=${metrics.maxTaskMs.get / 1e3}%7.1f s")
      n
    }

    for (h <- hubs) {
      println(s"\n[skew] === hub degree H=$h, tail $tailNodes nodes / $tailEdges edges ===")
      val edges = buildGraph(spark, h, tailNodes, tailEdges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = edges.count()
      val degs = GraphOps.degrees(edges)
        .agg(max("deg").as("maxd"),
          sum(col("deg") * (col("deg") - 1)).as("naiveW2"))
        .collect()(0)
      println(f"[skew] edges m=$m%,d  maxDeg=${degs.getLong(0)}%,d  " +
        f"Σdeg·(deg−1)/2=${degs.getLong(1) / 2}%,d  √m reference=${math.sqrt(m.toDouble)}%.0f")

      val orientedW = measured("oriented wedge count")(orientedWedges(edges).count())
      val naiveW = measured("naive wedge count")(naiveWedges(edges).count())

      val orientedT = measured("oriented triangles")(orientedTriangles(edges).count())
      if (h <= 20000 || naiveFull) {
        val naiveT = measured("naive triangles")(naiveTriangles(edges).count())
        val ok = naiveT == 3 * orientedT
        println(s"[skew] naive == 3×oriented triangles: $ok ($naiveT vs 3×$orientedT)")
        require(ok, "triangle counts disagree between shapes")
      } else {
        // each wedge row is 3 longs ≈ 24 B unserialized; the closing
        // join would shuffle the whole wedge stream on (v, w)
        println(f"[skew] naive close NOT run at H=$h: would shuffle ~$naiveW%,d wedge rows (~${naiveW * 24 / 1e9}%.0f GB raw) — set SPARK_GRAFT_NAIVE_FULL=on to force")
      }
      println(f"[skew] wedge ratio naive/oriented = ${naiveW.toDouble / orientedW}%.1f×")
      edges.unpersist(blocking = true)
    }
    spark.stop()
  }

  /** Canonical (src < dst) distinct edge set: hub 0 → 1..H plus a
    * mildly power-law random tail over nodes 1..N (endpoints from
    * xxhash64 of the row id, u² skew), fully deterministic. */
  private[graft] def buildGraph(spark: SparkSession, hubDeg: Long,
      tailNodes: Long, tailEdges: Long): DataFrame = {
    val hub = spark.range(1, hubDeg + 1)
      .select(lit(0L).as("src"), col("id").as("dst"))
    def endpoint(seed: Int) = {
      val u = (pmod(xxhash64(col("id"), lit(seed)), lit(1000000L))
        .cast("double") / 1000000.0)
      (lit(1L) + (u * u * (tailNodes - 1)).cast("long"))
    }
    val tail = spark.range(tailEdges)
      .select(endpoint(1).as("a"), endpoint(2).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
    hub.unionAll(tail).distinct()
  }

  /** The engine's wedge step, verbatim shape from
    * `GraphOps.distributedTriangles`: orient low → high in (deg, id),
    * generate head pairs at the rank-lowest center. */
  private[graft] def orientedWedges(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val ds = deg.select(col("node").as("src"), col("deg").as("sdeg"))
    val dd = deg.select(col("node").as("dst"), col("deg").as("ddeg"))
    val fwd = col("sdeg") < col("ddeg") ||
      (col("sdeg") === col("ddeg") && col("src") < col("dst"))
    val oriented = edges.join(ds, "src").join(dd, "dst")
      .select(
        when(fwd, col("src")).otherwise(col("dst")).as("u"),
        when(fwd, col("dst")).otherwise(col("src")).as("v"),
        when(fwd, col("ddeg")).otherwise(col("sdeg")).as("vdeg"))
    val a = oriented.select(col("u"), col("v"), col("vdeg"))
    val b = oriented.select(col("u"), col("v").as("w"), col("vdeg").as("wdeg"))
    a.join(b, Seq("u"))
      .filter(col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
  }

  /** The naive shape: symmetric adjacency self-joined at every
    * center, head pair ordered by id to count each wedge once per
    * CENTER — the hub key lands H rows × H rows in one task. */
  private[graft] def naiveWedges(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("c"), col("dst").as("n"))
      .unionAll(edges.select(col("dst").as("c"), col("src").as("n")))
    val a = sym.select(col("c"), col("n").as("v"))
    val b = sym.select(col("c"), col("n").as("w"))
    a.join(b, Seq("c")).filter(col("v") < col("w"))
  }

  private[graft] def orientedTriangles(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val ds = deg.select(col("node").as("src"), col("deg").as("sdeg"))
    val dd = deg.select(col("node").as("dst"), col("deg").as("ddeg"))
    val fwd = col("sdeg") < col("ddeg") ||
      (col("sdeg") === col("ddeg") && col("src") < col("dst"))
    val oriented = edges.join(ds, "src").join(dd, "dst")
      .select(
        when(fwd, col("src")).otherwise(col("dst")).as("u"),
        when(fwd, col("dst")).otherwise(col("src")).as("v"),
        when(fwd, col("ddeg")).otherwise(col("sdeg")).as("vdeg"))
    val a = oriented.select(col("u"), col("v"), col("vdeg"))
    val b = oriented.select(col("u"), col("v").as("w"), col("vdeg").as("wdeg"))
    val wedges = a.join(b, Seq("u"))
      .filter(col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w")))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    wedges.join(closing, Seq("v", "w")).select("u", "v", "w")
  }

  /** Naive close: the (id-ordered) wedge heads join the canonical
    * edge list — finds every triangle at all THREE corners. */
  private[graft] def naiveTriangles(edges: DataFrame): DataFrame =
    naiveWedges(edges)
      .join(edges.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select("c", "v", "w")
}
