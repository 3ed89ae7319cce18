package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (ARRAY<FLOAT>, 64-d).
  * a1 is the exact brute-force baseline (oracle-checked); a2 is the
  * random-hyperplane LSH scale path — signatures are per-row
  * expressions, candidates come from bucket equi-joins, and exact
  * cosine re-ranks only the candidates. Recall vs a1 is asserted in
  * SimilarityOpsSpec.
  */
object SimilarityOps {

  /** vectors with double-cast embedding and precomputed norm. */
  private def normed(emb: DataFrame): DataFrame = emb
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x*x))"))

  private val dot =
    "aggregate(zip_with(qv, cv, (x, y) -> x*y), 0D, (acc, x) -> acc + x)"

  /** Exact top-k neighbors for each query vector — broadcast-and-scan
    * kernel (graft.functions.VectorOps), queries broadcast, candidate
    * scan partition-parallel in primitive loops. */
  def annExact(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame =
    graft.functions.VectorOps.annTopK(emb, nQueries, k)

  /** Deterministic random-hyperplane signature: bit p = sign of
    * <v, plane_p>, planes pseudo-random from xxh64 (typed map with a
    * primitive loop — see graft.functions.HashOps). */
  def withSignature(vecs: DataFrame, nBits: Int = 16): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col("vec_id"), col("v"), col("nrm"))
      .fanOut // single-row-group scan: spread the hyperplane kernel
      .as[(Long, Array[Double], Double)]
      .map { case (id, v, nrm) =>
        (id, v, nrm, graft.functions.HashOps.hyperplaneSig(v, nBits))
      }
      .toDF("vec_id", "v", "nrm", "sig")
  }

  /** LSH ANN: candidates share one of `nBands` signature slices of
    * `bandBits` bits; exact cosine re-ranks candidates only.
    *
    * Band width trades candidate-set size against recall at the target
    * similarity: near-dup workloads (cos ≥ 0.9, bits agree w.p. ~0.9)
    * take wide bands (8 bits); moderate-similarity top-1 search
    * (cos ≈ 0.5 → bits agree w.p. ~2/3) needs narrow bands — 8×2 bits
    * here — because P(8-bit slice matches) ≈ (2/3)^8 ≈ 4%. */
  /** Banded signature frame (vec_id, v, nrm, b, h) — shared by the
    * ANN search and the embedding near-dup join (DedupOps). Band rows
    * come straight out of the typed flatMap as primitive tuples (one
    * JIT'd pass computes the signature AND slices the bands); the
    * earlier HOF explode interpreted a struct constructor per band and
    * re-copied the 64-d vector through the expression evaluator. */
  def withBands(emb: DataFrame, nBands: Int, bandBits: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val mask = (1L << bandBits) - 1
    val nBits = nBands * bandBits
    normed(emb).select(col("vec_id"), col("v"), col("nrm"))
      .fanOut // single-row-group scan: spread the hyperplane kernel
      .as[(Long, Array[Double], Double)]
      .flatMap { case (id, v, nrm) =>
        val sig = graft.functions.HashOps.hyperplaneSig(v, nBits)
        Iterator.tabulate(nBands)(b =>
          (id, v, nrm, b, (sig >>> (b * bandBits)) & mask))
      }
      .toDF("vec_id", "v", "nrm", "b", "h")
  }

  def annLsh(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      nBands: Int = 8, bandBits: Int = 2): DataFrame = {
    // Cosine runs in-stream on the band-join output and the multi-band
    // dedupe happens on (qid, cid, sim) triples — never on rows that
    // carry the vectors (a distinct over array columns hashes every
    // 64-d vector per row; recomputing the fused-codegen dot product
    // for multi-band collisions is far cheaper). No cache: the
    // signature pass is a JIT'd typed map over the embeddings scan,
    // cheaper to recompute per side than to materialize.
    val banded = withBands(emb, nBands, bandBits)
    val q = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("b"), col("h"))
    val c = banded.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("b"), col("h"))
    graft.functions.CosineSim.register(emb.sparkSession)
    q.join(c, Seq("b", "h")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.CosineSim.cosine_sim(col("qv"), col("cv")).as("sim_raw"))
      .distinct()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim_raw").desc, col("cid"))))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("cid"),
        round(col("sim_raw"), 5).as("sim"))
      .orderedSmall(col("qid"), col("rnk"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("a1_ann_exact",
      """WITH scored AS (
        |  SELECT a.vec_id qid, b.vec_id cid,
        |         CAST(LIST_COSINE_SIMILARITY(a.embedding, b.embedding) AS DOUBLE) sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT qid, cid, sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rnk
        |  FROM scored)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, ROUND(sim,5) AS sim
        |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      annExact(Tables.embeddings(s, d))
    },

    QueryDef.noOracle("a2_ann_lsh") { (s, d) =>
      annLsh(Tables.embeddings(s, d))
    }
  )
}
