package graft.functions

import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense-vector similarity kernels. The exact all-pairs/top-k paths
  * broadcast the (small) vector set and scan with primitive-array
  * loops inside `mapPartitions` — the broadcast-dimension pattern: the
  * scan side stays distributed and partition-parallel while the probe
  * side rides the broadcast. Catalyst higher-order functions are ~50×
  * slower here because lambda bodies are interpreted per element;
  * a 64-d dot product belongs in a JIT'd loop.
  *
  * These exact kernels are ground-truth baselines: at 100 TB the
  * vector set no longer broadcasts and the LSH paths
  * (SimilarityOps.annLsh / DedupOps) take over.
  */
object VectorOps {

  final case class ScoredPair(ia: Long, ib: Long, sim_raw: Double)

  // derived once per JVM (see graft.Enc): per-call implicit derivation
  // via runtime reflection is a measurable plan-time tax
  private val encScored: org.apache.spark.sql.Encoder[ScoredPair] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  private[graft] def normOf(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private[graft] def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** All-pairs cosine top-k (ia < ib), exact. Emits each partition's
    * local top-k (same comparator), then takes the global top-k —
    * only partitions×k rows ever shuffle. */
  def cosineTopKPairs(emb: DataFrame, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])](graft.Enc.longFloatArr)
      .map { case (id, e) =>
        // float→double widening in a JIT'd loop (the Catalyst
        // transform(...cast...) HOF interprets per element)
        val v = new Array[Double](e.length)
        var i = 0
        while (i < e.length) { v(i) = e(i); i += 1 }
        (id, v)
      }(graft.Enc.longDoubleArr)
    // Broadcast as FLAT parallel primitive arrays, id-sorted: a
    // Tuple3[(Long, Array[Double], Double)] per candidate boxes the id
    // and norm (Tuple3 is unspecialized) and pointer-chases to the
    // vector — per-PAIR costs in an N²/2 loop. Flat double[] keeps the
    // scan contiguous and unboxed. Sorting by id also lets each row
    // START its scan at the first id > ia (binary search) instead of
    // testing ia < ib on all N candidates — half the pair visits.
    val sorted = vecs.collect().sortBy(_._1) // small dim by contract; LSH at scale
    val dim = if (sorted.isEmpty) 0 else sorted(0)._2.length
    val all = spark.sparkContext.broadcast({
      val ids = new Array[Long](sorted.length)
      val nrms = new Array[Double](sorted.length)
      val flat = new Array[Double](sorted.length * dim)
      var j = 0
      while (j < sorted.length) {
        ids(j) = sorted(j)._1
        nrms(j) = normOf(sorted(j)._2)
        System.arraycopy(sorted(j)._2, 0, flat, j * dim, dim)
        j += 1
      }
      (ids, nrms, flat)
    })
    // fanOut: the N²/2 scan is the heavy kernel — without it the whole
    // pair scan pipelines into the single-row-group scan's one task.
    // The inner loop is allocation-free: a primitive insertion top-k
    // (parallel arrays, worst-at-end) instead of a PriorityQueue of
    // ScoredPair objects — the object form allocates per COMPARISON
    // (N²/2 of them) and was the whole stage's cost at bench SF.
    val localTop = vecs.toDF("vec_id", "v").fanOut
      .as[(Long, Array[Double])](graft.Enc.longDoubleArr).mapPartitions { it =>
      val (cIds, cNrms, cFlat) = all.value
      val sims = new Array[Double](k)
      val rks = new Array[Long](k)
      val ias = new Array[Long](k)
      val ibs = new Array[Long](k)
      var n = 0
      // total tie order = (ROUNDED sim desc, ia asc, ib asc); slot i
      // beats i+1. Ranking on the raw double broke at the 10× corpus:
      // replicated vectors score last-ulp-apart sims that ROUND equal,
      // so a raw order keeps different copies than the oracle's
      // rounded order (the a11/l5 house pattern, applied here). The
      // key is sign·floor(|sim|·1e5 + 0.5) — HALF_UP away from zero,
      // the same tie direction as Catalyst/DuckDB ROUND even for
      // negative sims landing exactly on a 5-decimal half boundary;
      // a couple of flops per candidate, no BigDecimal in the N²/2
      // loop. The displayed value still comes from Catalyst round()
      // below, which groups identically.
      def beats(rk: Long, ia: Long, ib: Long, i: Int): Boolean =
        rk > rks(i) || (rk == rks(i) &&
          (ia < ias(i) || (ia == ias(i) && ib < ibs(i))))
      for ((ia, va) <- it) {
        val na = normOf(va)
        // first candidate with id > ia (ids sorted ascending)
        var lo = 0; var hi = cIds.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cIds(mid) <= ia) lo = mid + 1 else hi = mid
        }
        var j = lo
        while (j < cIds.length) {
          val ib = cIds(j)
          val off = j * dim // one-table all-pairs: dim == va.length
          // same summation order as dot(): identical doubles
          var s = 0.0; var i = 0
          while (i < dim) { s += va(i) * cFlat(off + i); i += 1 }
          val sim = s / (na * cNrms(j))
          val rk = (math.signum(sim) * math.floor(math.abs(sim) * 1e5 + 0.5)).toLong
          if (n < k || beats(rk, ia, ib, n - 1)) {
            var i2 = math.min(n, k - 1)
            while (i2 > 0 && beats(rk, ia, ib, i2 - 1)) {
              sims(i2) = sims(i2 - 1); rks(i2) = rks(i2 - 1)
              ias(i2) = ias(i2 - 1); ibs(i2) = ibs(i2 - 1)
              i2 -= 1
            }
            sims(i2) = sim; rks(i2) = rk; ias(i2) = ia; ibs(i2) = ib
            if (n < k) n += 1
          }
          j += 1
        }
      }
      Iterator.tabulate(n)(i => ScoredPair(ias(i), ibs(i), sims(i)))
    }(encScored)
    localTop.toDF()
      // global selection on the ROUNDED score too (partitions×k rows —
      // the round() is off the hot path), matching the kernel's order
      .orderBy(round(col("sim_raw"), 5).desc, col("ia"), col("ib")).limit(k)
      .select(col("ia"), col("ib"), round(col("sim_raw"), 5).as("sim"))
  }

  /** ALL pairs with cosine ≥ tau, exact (broadcast scan). Ground truth
    * for the LSH near-dup path. */
  def cosinePairsAbove(emb: DataFrame, tau: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])](graft.Enc.longFloatArr)
      .map { case (id, e) =>
        // float→double widening in a JIT'd loop (the Catalyst
        // transform(...cast...) HOF interprets per element)
        val v = new Array[Double](e.length)
        var i = 0
        while (i < e.length) { v(i) = e(i); i += 1 }
        (id, v)
      }(graft.Enc.longDoubleArr)
    val all = spark.sparkContext.broadcast(
      vecs.collect().sortBy(_._1).map { case (id, v) => (id, v, normOf(v)) })
    vecs.mapPartitions { it =>
      val arr = all.value
      it.flatMap { case (ia, va) =>
        val na = normOf(va)
        arr.iterator.flatMap { case (ib, vb, nb) =>
          if (ia >= ib) None
          else {
            val sim = dot(va, vb) / (na * nb)
            if (sim >= tau) Some(ScoredPair(ia, ib, sim)) else None
          }
        }
      }
    }(encScored).toDF()
      .select(col("ia"), col("ib"), round(col("sim_raw"), 5).as("sim"))
      .orderedRows(col("ia"), col("ib")) // qualifying pairs scale with corpus
  }

  /** Seeded Lloyd's k-means over a bounded in-memory sample — the IVF
    * coarse-quantizer trainer. Training on a driver-side sample is the
    * standard IVF construction (the quantizer needs only a sketch of
    * the density, and k × dim centroids must be broadcast-sized
    * anyway); assignment and probing stay distributed. Deterministic:
    * evenly-spaced initial centers, fixed iteration count, empty cells
    * keep their previous centroid. */
  def kmeansFit(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty && k > 0)
    val n = sample.length
    val dim = sample(0).length
    val kk = math.min(k, n)
    var centers = Array.tabulate(kk)(c => sample((c.toLong * n / kk).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var i = 0
      while (i < n) {
        val v = sample(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var j = 0
          val ctr = centers(c)
          while (j < dim) { val t = v(j) - ctr(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      centers = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centers(c)
        else { val s = sums(c); val m = new Array[Double](dim)
          var j = 0; while (j < dim) { m(j) = s(j) / counts(c); j += 1 }; m }
      }
      it += 1
    }
    centers
  }

  /** Exact top-k neighbors for each of the first `nQueries` vec_ids:
    * queries broadcast, candidates scanned partition-parallel. */
  def annTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame =
    annTopKOver(emb, emb, nQueries, k)

  /** [[annTopK]] with a separate CANDIDATE frame — the filtered-search
    * form: queries still come from the first `nQueries` vec_ids of
    * `emb`, but only `candidates` rows may appear as neighbors. The
    * metadata predicate belongs on the candidate SCAN (pre-filtering),
    * never as a post-filter on an unfiltered top-k — post-filtering
    * returns fewer than k (or zero) survivors whenever the filter is
    * selective, which is the filtered-search correctness trap. */
  def annTopKOver(emb: DataFrame, candidates: DataFrame,
      nQueries: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    def widened(df: DataFrame) = df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])](graft.Enc.longFloatArr)
      .map { case (id, e) =>
        // float→double widening in a JIT'd loop (the Catalyst
        // transform(...cast...) HOF interprets per element)
        val v = new Array[Double](e.length)
        var i = 0
        while (i < e.length) { v(i) = e(i); i += 1 }
        (id, v)
      }(graft.Enc.longDoubleArr)
    val vecs = widened(candidates)
    val queries = spark.sparkContext.broadcast(
      widened(emb).filter(_._1 < nQueries).collect().map {
        case (id, v) => (id, v, normOf(v))
      })
    val scored = vecs.mapPartitions { it =>
      val qs = queries.value
      // per-partition top-k per query; global rank prunes the rest
      val tops = qs.map(q => q._1 ->
        scala.collection.mutable.PriorityQueue.empty[ScoredPair](
          Ordering.by((p: ScoredPair) => (-p.sim_raw, p.ib)))).toMap
      for ((cid, cv) <- it; (qid, qv, qn) <- qs if qid != cid) {
        val sim = dot(qv, cv) / (qn * normOf(cv))
        val pq = tops(qid)
        val cand = ScoredPair(qid, cid, sim)
        if (pq.size < k) pq.enqueue(cand)
        else if (sim > pq.head.sim_raw ||
          (sim == pq.head.sim_raw && cid < pq.head.ib)) {
          pq.dequeue(); pq.enqueue(cand)
        }
      }
      tops.valuesIterator.flatMap(_.iterator)
    }(encScored)
    scored.toDF()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("ia").orderBy(col("sim_raw").desc, col("ib"))))
      .filter(col("rnk") <= k)
      .select(col("ia").as("qid"), col("rnk").cast("long").as("rnk"),
        col("ib").as("cid"), round(col("sim_raw"), 5).as("sim"))
      .orderedSmall(col("qid"), col("rnk"))
  }

  /** Batch ANN serving: exact top-k for EVERY row of a query TABLE
    * (qid, qv ARRAY<FLOAT|DOUBLE>) against a candidate frame (vec_id,
    * embedding) — the dataflow form of [[annTopKOver]] for 10⁴+-query
    * workloads (a11). The query table rides a broadcast (the same
    * build-side ship a broadcast join performs — ~5 MB at 10⁴×64-d);
    * candidates stream through their scan tasks, each keeping a Q×k
    * slot matrix (1.2 MB at 10⁴×5), so the exchange carries only
    * partitions×Q×k shortlist rows — never the Q×N scored pairs.
    *
    * This replaced the crossJoin(broadcast)+udaf plan: a typed
    * `Aggregator` plans as ObjectHashAggregate, which (a) cannot
    * participate in whole-stage codegen, so the nested-loop join
    * MATERIALIZED all Q×N joined rows with both 64-float arrays copied
    * into each, and (b) falls back to sort-based aggregation past 128
    * distinct keys, sorting the whole Q×N stream at 10⁴ groups —
    * 21 s at bench SF for a kernel this runs in ~0.3 s.
    *
    * Ranking: candidates are kept by the ROUNDED score (the l3 house
    * pattern — sign·floor(|sim|·1e5+0.5), ties cid asc) so float last-ulp
    * noise cannot make the kernel keep different rows than the
    * oracle's ROUND()-ranked order; the displayed value is Catalyst
    * round() over the raw sim, identical grouping for dot-product
    * sims.
    *
    * `blockRows` is the beyond-broadcast scale path: a query table too
    * large for one broadcast splits into qid-ordered blocks of at most
    * `blockRows`, one kernel pass (one candidate scan) per block —
    * exact serving is compute-bound at Q×N×d flops regardless, so the
    * extra scans are the honest trade, and each block's qids are
    * disjoint so the per-block shortlists union without interference
    * (blocked ≡ unblocked is spec-pinned). Approximate serving below
    * that cost lives in the IVF/LSH entries; a bucket JOIN is wrong
    * for this corpus's low-sim regime (2-bit bands collide on ~25% of
    * RANDOM pairs — the bucketed candidate set would exceed Q×N; see
    * annLsh's regime note). */
  def serveTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      blockRows: Int = Int.MaxValue): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qArr = queries
      .select(col("qid"), col("qv").cast("array<double>").as("qv"))
      .as[(Long, Array[Double])](graft.Enc.longDoubleArr)
      .collect().sortBy(_._1)
    val qDim = if (qArr.isEmpty) 0 else qArr(0)._2.length
    val blocks =
      if (qArr.isEmpty) Array(qArr)
      else qArr.grouped(math.max(1, blockRows)).toArray
    val perBlock = blocks.map { block =>
      // flat parallel primitive arrays (the cosineTopKPairs layout):
      // unboxed and contiguous — the inner loop runs per (candidate,
      // query) pair, where a Tuple3 id/norm unbox + vector pointer
      // chase is a per-pair tax
      val qBc = spark.sparkContext.broadcast({
        val ids = new Array[Long](block.length)
        val nrms = new Array[Double](block.length)
        val flat = new Array[Double](block.length * qDim)
        var q = 0
        while (q < block.length) {
          ids(q) = block(q)._1
          nrms(q) = normOf(block(q)._2)
          System.arraycopy(block(q)._2, 0, flat, q * qDim, qDim)
          q += 1
        }
        (ids, nrms, flat)
      })
      candidates
        .select(col("vec_id"), col("embedding"))
        .fanOut // single-row-group scan: spread the Q×N kernel
        .as[(Long, Array[Float])](graft.Enc.longFloatArr)
        .mapPartitions { it =>
          val (qIds, qNrms, qFlat) = qBc.value
        val nQ = qIds.length
        // flat Q×k slot matrix, slot (q, i) at q*k+i, ranked per query
        // by (rk desc, cid asc); ns(q) = used slots
        val rks = new Array[Long](nQ * k)
        val cids = new Array[Long](nQ * k)
        val sims = new Array[Double](nQ * k)
        val ns = new Array[Int](nQ)
        for ((cid, cf) <- it) {
          val cv = new Array[Double](cf.length)
          var i = 0
          while (i < cf.length) { cv(i) = cf(i); i += 1 }
          val cn = normOf(cv)
          var q = 0
          while (q < nQ) {
            // same summation order as dot() over the QUERY length
            // (the old dot(qv, cv) bound): identical doubles
            var s = 0.0; var i2 = 0; val off = q * qDim
            while (i2 < qDim) { s += qFlat(off + i2) * cv(i2); i2 += 1 }
            val sim = s / (qNrms(q) * cn)
            val rk = (math.signum(sim) * math.floor(math.abs(sim) * 1e5 + 0.5)).toLong
            val base = q * k
            val n = ns(q)
            @inline def beats(j: Int): Boolean =
              rk > rks(base + j) || (rk == rks(base + j) && cid < cids(base + j))
            if (n < k || beats(n - 1)) {
              var j = math.min(n, k - 1)
              while (j > 0 && beats(j - 1)) {
                rks(base + j) = rks(base + j - 1)
                cids(base + j) = cids(base + j - 1)
                sims(base + j) = sims(base + j - 1)
                j -= 1
              }
              rks(base + j) = rk; cids(base + j) = cid; sims(base + j) = sim
              if (n < k) ns(q) += 1
            }
            q += 1
          }
        }
        Iterator.range(0, nQ).flatMap { q =>
          Iterator.tabulate(ns(q))(i =>
            ScoredPair(qIds(q), cids(q * k + i), sims(q * k + i)))
        }
      }(encScored)
    }
    val localTop = perBlock.reduce(_ union _)
    localTop.toDF()
      .withColumn("rnk", row_number().over(Window.partitionBy("ia")
        .orderBy(round(col("sim_raw"), 5).desc, col("ib"))))
      .filter(col("rnk") <= k)
      .select(col("ia").as("qid"), col("rnk").cast("long").as("rnk"),
        col("ib").as("cid"), round(col("sim_raw"), 5).as("sim"))
      .orderedRows(col("qid"), col("rnk"))
  }

  /** Exact MAXIMUM INNER PRODUCT top-k — recommender-serving scoring
    * (user · item), where the ranking metric is the RAW dot product,
    * not cosine: a candidate's own magnitude is part of its score, so
    * cosine indexes mis-rank it. Same broadcast-scan shape as
    * [[annTopKOver]]; ground truth for the norm-augmentation reduction
    * ([x; √(M²−‖x‖²)] turns MIPS into cosine search — spec-proven, the
    * LSH serving path at scale). */
  def mipsTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])](graft.Enc.longFloatArr)
      .map { case (id, e) =>
        val v = new Array[Double](e.length)
        var i = 0
        while (i < e.length) { v(i) = e(i); i += 1 }
        (id, v)
      }(graft.Enc.longDoubleArr)
    val queries = spark.sparkContext.broadcast(
      vecs.filter(_._1 < nQueries).collect())
    val scored = vecs.mapPartitions { it =>
      val qs = queries.value
      val tops = qs.map(q => q._1 ->
        scala.collection.mutable.PriorityQueue.empty[ScoredPair](
          Ordering.by((p: ScoredPair) => (-p.sim_raw, p.ib)))).toMap
      for ((cid, cv) <- it; (qid, qv) <- qs if qid != cid) {
        val ip = dot(qv, cv)
        val pq = tops(qid)
        if (pq.size < k) pq.enqueue(ScoredPair(qid, cid, ip))
        else if (ip > pq.head.sim_raw ||
          (ip == pq.head.sim_raw && cid < pq.head.ib)) {
          pq.dequeue(); pq.enqueue(ScoredPair(qid, cid, ip))
        }
      }
      tops.valuesIterator.flatMap(_.iterator)
    }(encScored)
    scored.toDF()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("ia").orderBy(col("sim_raw").desc, col("ib"))))
      .filter(col("rnk") <= k)
      .select(col("ia").as("qid"), col("rnk").cast("long").as("rnk"),
        col("ib").as("cid"), round(col("sim_raw"), 5).as("ip"))
      .orderedSmall(col("qid"), col("rnk"))
  }
}
