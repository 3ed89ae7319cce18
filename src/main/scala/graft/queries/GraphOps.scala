package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the co-purchase graph (r14): nodes = parts,
  * undirected edge (a, b) when parts a and b appear in the same order
  * (the classic market-basket projection — self-join of `lineitem` on
  * `l_orderkey`, canonicalized `src < dst`, deduplicated). Order size
  * is bounded by schema contract (TPC-H ≤ 7 lines/order), so the
  * per-order pair expansion is O(1) per order and the edge build is a
  * single equi-join shuffle — no quadratic blowup at any SF.
  *
  * Both operators are EXACT and ORDER-INDEPENDENT by construction:
  *
  *  - g1 PageRank runs in scaled fixed-point integer arithmetic
  *    (SCALE = 1e12, damping 0.85 as `(85 * x) DIV 100`). Float
  *    PageRank is nondeterministic on a cluster — partial-sum order
  *    varies with partitioning, and after 5 damped iterations the
  *    low bits differ run-to-run, which poisons hash-compared results
  *    and makes regressions undiagnosable. Integer sums are
  *    associative-commutative, so a 1000-executor run and DuckDB
  *    produce bit-identical ranks (spec: repartition-invariance).
  *  - g2 triangle counting orients each edge from its (degree, id)-
  *    smaller endpoint to the larger (the Schank–Wagner/Cohen
  *    map-reduce orientation): every wedge is generated at its
  *    lowest-degree vertex, bounding per-vertex candidate pairs by
  *    O(sqrt(m)) instead of O(max-degree²) — the skew bomb a raw
  *    neighbor self-join detonates on hub nodes at 100 TB.
  *
  * Scale notes (100 TB design intent):
  *  - the symmetrized edge list is built ONCE, hash-partitioned by
  *    `src`, and cached; `InMemoryRelation` preserves the cached
  *    plan's `outputPartitioning`, so each PageRank iteration's
  *    contribution join exchanges only the rank frame (N rows) —
  *    the edge side (m rows, the heavy side) never re-shuffles.
  *  - 5 unrolled iterations keep lineage shallow; a production run at
  *    30–50 iterations would `localCheckpoint` every ~5 to cut plan
  *    growth (documented, not needed at bench depth).
  *  - vertex set = endpoints of edges (isolated parts carry no rank
  *    mass and no triangles; both engines derive the same set).
  */
object GraphOps {

  private val Scale = 1000000000000L // 1e12 fixed-point rank mass

  /** Canonical undirected co-purchase edges: src < dst, distinct. */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val a = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("src"))
    val b = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("dst"))
    a.join(b, "ok")
      .filter(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()
  }

  /** Degree per node over the canonical edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** The small-graph probe: collect up to `limit + 1` edges in one
    * job. `Some(es)` = the WHOLE edge set (≤ limit, safe to fold on
    * the driver); `None` = over the bound — caller takes the
    * distributed path. The cap keeps the driver safe at any scale:
    * a 100 TB graph returns `None` after fetching bound+1 rows, it
    * never materializes. */
  private def smallEdges(edges: DataFrame, limit: Long): Option[Array[(Long, Long)]] = {
    if (limit <= 0) return None
    val cap = math.min(limit, Int.MaxValue - 1L).toInt
    val rows = edges.select(col("src"), col("dst")).limit(cap + 1).collect()
    if (rows.length > cap) None
    else Some(rows.map(r => (r.getLong(0), r.getLong(1))))
  }

  private def emptyRanks(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    edges.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("node", LongType),
        StructField("degree", LongType), StructField("rank_scaled", LongType))))
  }

  /** Fixed-point integer PageRank (damping 85/100, `iters` rounds).
    * Returns (node, degree, rank_scaled) for the top-`k` nodes by
    * rank. All arithmetic is BIGINT floor division on non-negative
    * values — identical in Spark (`DIV`), DuckDB (`//`), and the
    * driver fast path (`/` on positive Longs): because integer sums
    * are associative-commutative, ALL paths produce bit-identical
    * ranks (spec: driver ≡ distributed ≡ repartitioned).
    *
    * SMALL-GRAPH FAST PATH (the d4 `clusterPairs` contract): at or
    * below `smallGraphLimit` edges the ranks are computed on the
    * driver from one collect — iters × m Long ops, milliseconds —
    * instead of paying iters × (join + agg) in job latency. The
    * default bound (2²⁴ edges ≈ 256 MiB of edge longs) is the same
    * size this session already grants every broadcast join; above it
    * the distributed loop runs: symmetric edges built ONCE,
    * hash-partitioned by src and cached (`InMemoryRelation` keeps the
    * partitioning, so each iteration exchanges only the N-row rank
    * frame), final ≤k result leaf-ified before caches drop. Pass
    * `smallGraphLimit = 0` to force the distributed path (specs do).
    */
  def pagerank(edges: DataFrame, iters: Int, k: Int,
      smallGraphLimit: Long = 1L << 24): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // ONE guarded job decides the path AND fetches the small case:
    // CollectLimit(bound+1) scans incrementally with in-query stage
    // reuse, so the common small case pays a single pass and zero
    // cache writes; only an over-bound graph falls through to persist.
    smallEdges(edges, smallGraphLimit) match {
      case Some(es) if es.isEmpty => return emptyRanks(edges)
      case Some(es) => return driverPagerank(edges.sparkSession, es, iters, k)
      case None =>
    }
    val e0 = edges.persist(StorageLevel.MEMORY_AND_DISK)
    // deg is the N-row vertex frame: cached, it seeds the rank vector
    // and the final join, and its count is |V| — no extra sym-wide
    // countDistinct/distinct jobs.
    val deg = degrees(e0).persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    if (n == 0) { // forced-distributed empty graph (specs)
      deg.unpersist(blocking = false); e0.unpersist(blocking = false)
      return emptyRanks(edges)
    }
    // symmetric directed edges carrying the SOURCE degree (the only
    // degree a contribution needs), partitioned by src once for the
    // iterated join, cached: the m-row side never moves again.
    val sym = symEdges(e0, deg).persist(StorageLevel.MEMORY_AND_DISK)
    val ranks = distributedRankLoop(sym, deg, n, iters)
    val out = ranks.join(deg, "node")
      .select(col("node"), col("deg").as("degree"), col("r").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("node"))
      .limit(k)
      // materialize the ≤k-row result as a leaf so the loop's caches
      // can be dropped without the returned plan recomputing uncached
      .localCheckpoint(true)
    sym.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    e0.unpersist(blocking = false)
    out
  }

  /** Symmetric directed edge frame with source degree attached,
    * hash-partitioned by src (built once, cached by the caller). */
  private[graft] def symEdges(e0: DataFrame, deg: DataFrame): DataFrame =
    e0.select(col("src"), col("dst"))
      .unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "srcDeg"), "src")
      .repartition(col("src"))

  /** The distributed rank recurrence as a LAZY plan (no driver
    * actions) — separated so the plan spec can assert the movement
    * contract: ranks (N rows) broadcast into the cached m-row side,
    * zero exchange on the join, ONE agg shuffle per iteration — the
    * minimum movement an iterative rank update has. */
  private[graft] def distributedRankLoop(sym: DataFrame, deg: DataFrame,
      n: Long, iters: Int): DataFrame = {
    val init = Scale / n
    val base = init * 15 / 100
    var ranks = deg.select(col("node"), lit(init).as("r"))
    for (_ <- 1 to iters) {
      ranks = sym.join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst").as("node"))
        .agg(expr(s"$base + (85 * SUM(r DIV srcDeg)) DIV 100").as("r"))
    }
    ranks
  }

  /** Sorted distinct endpoints of `es` — primitive sort + in-place
    * dedup; lookups are `Arrays.binarySearch`. A boxed HashMap here
    * costs ~450 ns/lookup on this host (measured) × 4m lookups. */
  private def nodeIndex(es: Array[(Long, Long)]): Array[Long] = {
    val flat = new Array[Long](es.length * 2)
    var i = 0
    es.foreach { case (a, b) => flat(i) = a; i += 1; flat(i) = b; i += 1 }
    java.util.Arrays.sort(flat)
    var w = 0
    var j = 0
    while (j < flat.length) {
      if (w == 0 || flat(j) != flat(w - 1)) { flat(w) = flat(j); w += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(flat, w)
  }

  /** Driver twin of the distributed recurrence — same integers. */
  private[graft] def driverPagerank(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long)], iters: Int, k: Int): DataFrame = {
    import spark.implicits._
    val nodes = nodeIndex(es)
    @inline def idx(x: Long): Int = java.util.Arrays.binarySearch(nodes, x)
    val n = nodes.length
    val deg = new Array[Long](n)
    val srcs = new Array[Int](es.length * 2)
    val dsts = new Array[Int](es.length * 2)
    var i = 0
    es.foreach { case (a, b) =>
      val (ia, ib) = (idx(a), idx(b))
      deg(ia) += 1; deg(ib) += 1
      srcs(i) = ia; dsts(i) = ib; i += 1
      srcs(i) = ib; dsts(i) = ia; i += 1
    }
    val init = Scale / n
    val base = init * 15 / 100
    var r = Array.fill(n)(init)
    for (_ <- 1 to iters) {
      val contrib = new Array[Long](n)
      var j = 0
      while (j < srcs.length) {
        contrib(dsts(j)) += r(srcs(j)) / deg(srcs(j)); j += 1
      }
      r = Array.tabulate(n)(u => base + 85 * contrib(u) / 100)
    }
    nodes.indices.map(u => (nodes(u), deg(u), r(u)))
      .sortBy { case (node, _, rank) => (-rank, node) }
      .take(k)
      .toDF("node", "degree", "rank_scaled")
  }

  /** Per-node triangle counts via (degree, id) edge orientation.
    * Returns (node, deg, triangles) top-`k` by count; triangle-free
    * nodes are absent. Same fast-path contract as [[pagerank]]: the
    * driver twin runs the SAME oriented-wedge algorithm (integer
    * counts — any execution order yields identical results), the
    * distributed join is the 100 TB path. */
  def triangleCounts(edges: DataFrame, k: Int,
      smallGraphLimit: Long = 1L << 24): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    def empty() = {
      import org.apache.spark.sql.types._
      edges.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("node", LongType),
          StructField("deg", LongType), StructField("triangles", LongType))))
    }
    smallEdges(edges, smallGraphLimit) match {
      case Some(es) if es.isEmpty => return empty()
      case Some(es) => return driverTriangles(edges.sparkSession, es, k)
      case None =>
    }
    val e0 = edges.persist(StorageLevel.MEMORY_AND_DISK)
    if (e0.isEmpty) { e0.unpersist(blocking = false); return empty() }
    val out = distributedTriangles(e0, k)
    e0.unpersist(blocking = false)
    out
  }

  private def distributedTriangles(edges: DataFrame, k: Int): DataFrame = {
    val deg = degrees(edges)
    val ds = deg.select(col("node").as("src"), col("deg").as("sdeg"))
    val dd = deg.select(col("node").as("dst"), col("deg").as("ddeg"))
    // orient low → high in (deg, id) order; carry the head's (deg, id)
    // so the wedge step can order the two heads without a re-join.
    val fwd = col("sdeg") < col("ddeg") ||
      (col("sdeg") === col("ddeg") && col("src") < col("dst"))
    val oriented = edges.join(ds, "src").join(dd, "dst")
      .select(
        when(fwd, col("src")).otherwise(col("dst")).as("u"),
        when(fwd, col("dst")).otherwise(col("src")).as("v"),
        when(fwd, col("ddeg")).otherwise(col("sdeg")).as("vdeg"))
      .cache()
    // wedges at the lowest-ranked vertex: heads v < w in (deg, id)
    val a = oriented.select(col("u"), col("v"), col("vdeg"))
    val b = oriented.select(col("u"), col("v").as("w"), col("vdeg").as("wdeg"))
    val wedges = a.join(b, Seq("u"))
      .filter(col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w")))
    // close the wedge: oriented edge (v, w) must exist
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    val perNode = tris.select(col("u").as("node"))
      .unionAll(tris.select(col("v").as("node")))
      .unionAll(tris.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val out = perNode.join(deg, "node")
      .select(col("node"), col("deg"), col("triangles"))
      .orderBy(col("triangles").desc, col("node"))
      .limit(k)
      .localCheckpoint(true) // leaf-ify before dropping the cache
    oriented.unpersist(blocking = false)
    out
  }

  /** Driver twin of the oriented-wedge triangle count. Primitive-array
    * CSR adjacency (out-neighbors stored by orientation RANK, sorted)
    * with sorted-merge intersection per oriented edge — the per-wedge
    * hash lookup of the naive form is ~450 ns on this host (measured),
    * which at millions of wedges dominates the entry; two-pointer
    * merges over int arrays are ~100× cheaper and count the SAME
    * triangles (each at its rank-lowest vertex). */
  private[graft] def driverTriangles(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long)], k: Int): DataFrame = {
    import spark.implicits._
    val nodes = nodeIndex(es)
    @inline def idx(x: Long): Int = java.util.Arrays.binarySearch(nodes, x)
    val n = nodes.length
    val deg = new Array[Long](n)
    es.foreach { case (a, b) => deg(idx(a)) += 1; deg(idx(b)) += 1 }
    // orientation rank: position in the (deg, id) total order —
    // identical to the distributed join's (deg, node) comparisons
    val byRank = Array.range(0, n).sortBy(i => (deg(i), nodes(i)))
    val rank = new Array[Int](n)
    byRank.zipWithIndex.foreach { case (i, r) => rank(i) = r }
    // CSR out-adjacency in rank space: edge (a, b) oriented from the
    // rank-smaller endpoint; neighbor lists sorted for the merges
    val outdeg = new Array[Int](n)
    es.foreach { case (a, b) =>
      val (ra, rb) = (rank(idx(a)), rank(idx(b)))
      outdeg(math.min(ra, rb)) += 1
    }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + outdeg(i); i += 1 }
    val nbr = new Array[Int](es.length)
    val fill = off.clone()
    es.foreach { case (a, b) =>
      val (ra, rb) = (rank(idx(a)), rank(idx(b)))
      val u = math.min(ra, rb); val v = math.max(ra, rb)
      nbr(fill(u)) = v; fill(u) += 1
    }
    var u = 0
    while (u < n) {
      java.util.Arrays.sort(nbr, off(u), off(u + 1)); u += 1
    }
    // for each oriented edge (u, v): common out-neighbors w close a
    // triangle (u < v < w in rank order — counted exactly once)
    val tri = new Array[Long](n)
    u = 0
    while (u < n) {
      var e = off(u)
      while (e < off(u + 1)) {
        val v = nbr(e)
        var p = e + 1 // adj(u) entries > v only: w must outrank v
        var q = off(v)
        val pEnd = off(u + 1); val qEnd = off(v + 1)
        while (p < pEnd && q < qEnd) {
          val x = nbr(p); val y = nbr(q)
          if (x == y) { tri(u) += 1; tri(v) += 1; tri(x) += 1; p += 1; q += 1 }
          else if (x < y) p += 1
          else q += 1
        }
        e += 1
      }
      u += 1
    }
    byRank.indices.collect { case r if tri(r) > 0 => (nodes(byRank(r)), deg(byRank(r)), tri(r)) }
      .sortBy { case (node, _, t) => (-t, node) }
      .take(k)
      .toDF("node", "deg", "triangles")
  }

  /** Shared oracle CTE prefix: the co-purchase edge list.
    * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
    * reference, and the 5-iteration PageRank chain (each rK references
    * sym/deg/n) re-expands the 10M-row self-join combinatorially — a
    * measured runaway (>2.5 CPU-hours at the 10× corpus) that the
    * hints collapse to one execution per CTE. */
  private val edgeCte =
    """WITH pairs AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |  WHERE a.l_partkey < b.l_partkey),
      |deg AS MATERIALIZED (
      |  SELECT node, COUNT(*) AS deg FROM (
      |    SELECT src AS node FROM pairs
      |    UNION ALL SELECT dst AS node FROM pairs) t GROUP BY node)""".stripMargin

  private def pagerankSql(iters: Int, k: Int): String = {
    val sym =
      """sym AS MATERIALIZED (
        |  SELECT p.src, p.dst, d.deg AS srcdeg FROM (
        |    SELECT src, dst FROM pairs
        |    UNION ALL SELECT dst AS src, src AS dst FROM pairs) p
        |  JOIN deg d ON d.node = p.src),
        |n AS MATERIALIZED (SELECT COUNT(*) AS n FROM deg),
        |r0 AS (SELECT node, (1000000000000 // (SELECT n FROM n)) AS r FROM deg)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         CAST(((1000000000000 // (SELECT n FROM n)) * 15) // 100
         |         + (85 * SUM(p.r // e.srcdeg)) // 100 AS BIGINT) AS r
         |  FROM r${i - 1} p JOIN sym e ON e.src = p.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""$edgeCte,
       |$sym,
       |$steps
       |SELECT r.node, d.deg AS degree, r.r AS rank_scaled
       |FROM r$iters r JOIN deg d ON d.node = r.node
       |ORDER BY rank_scaled DESC, r.node LIMIT $k""".stripMargin
  }

  private def triangleSql(k: Int): String =
    s"""$edgeCte,
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND p.src < p.dst)
       |              THEN p.src ELSE p.dst END AS u,
       |         CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND p.src < p.dst)
       |              THEN p.dst ELSE p.src END AS v,
       |         CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND p.src < p.dst)
       |              THEN dd.deg ELSE ds.deg END AS vdeg
       |  FROM pairs p
       |  JOIN deg ds ON ds.node = p.src
       |  JOIN deg dd ON dd.node = p.dst),
       |tri AS MATERIALIZED (
       |  SELECT a.u, a.v, b.v AS w
       |  FROM o a JOIN o b ON a.u = b.u
       |  JOIN o c ON c.u = a.v AND c.v = b.v
       |  WHERE a.vdeg < b.vdeg OR (a.vdeg = b.vdeg AND a.v < b.v)),
       |pern AS (
       |  SELECT node, COUNT(*) AS triangles FROM (
       |    SELECT u AS node FROM tri
       |    UNION ALL SELECT v AS node FROM tri
       |    UNION ALL SELECT w AS node FROM tri) t GROUP BY node)
       |SELECT p.node, d.deg, p.triangles
       |FROM pern p JOIN deg d ON d.node = p.node
       |ORDER BY triangles DESC, p.node LIMIT $k""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("g1_pagerank", pagerankSql(iters = 5, k = 100)) { (s, d) =>
      pagerank(coPurchaseEdges(Tables.lineitem(s, d)), iters = 5, k = 100)
    },

    QueryDef("g2_triangle_count", triangleSql(k = 100)) { (s, d) =>
      triangleCounts(coPurchaseEdges(Tables.lineitem(s, d)), k = 100)
    }
  )
}
