package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import graft.functions.HashOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate dedup — the 100 TB scale paths whose ground truths are
  * the exact operators in TextOps (l1/l2) and SimilarityOps.
  *
  * Signatures are computed in typed maps with primitive loops
  * (graft.functions.HashOps — interpreted HOF lambdas are ~50× slower
  * for O(tokens × bits) inner loops); everything after the signature is
  * declarative Catalyst. The only shuffles touch signature-sized rows
  * (never all pairs), and candidate verification runs exact similarity
  * on the candidate set only — the property that keeps near-dup
  * detection sub-quadratic at scale.
  */
object DedupOps {

  /** 3-token shingle set per doc (distinct), as array. */
  private def shingled(docs: DataFrame): DataFrame = docs
    .withColumn("toks", split(col("text"), " "))
    .filter(size(col("toks")) >= 3)
    .withColumn("shingles", expr(
      "array_distinct(transform(sequence(0, size(toks)-3), " +
        "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
    .select(col("doc_id"), col("shingles"))

  /** MinHash signatures (bands × rowsPerBand hashes) + LSH banding.
    * Returns candidate pairs with their *exact* Jaccard ≥ tau.
    * P(candidate | j=0.8) with 8×4 ≈ 98.5%; recall vs the exact l2
    * output is asserted in PipelineOpsSpec. */
  def minhashPairs(docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 4,
      tau: Double = 0.8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = bands * rowsPerBand
    val sets = shingled(docs).as[(Long, Array[String])].cache()
    val banded = sets.map { case (id, sh) =>
      (id, HashOps.bandHashes(HashOps.minhashSig(sh, n), bands, rowsPerBand))
    }.toDF("doc_id", "bh")
      .select(col("doc_id"), posexplode(col("bh")).as(Seq("b", "h")))
      .cache()
    val cand = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
      .distinct()
    // exact Jaccard verification on candidates only
    cand
      .join(sets.toDF("ia", "sa"), Seq("ia"))
      .join(sets.toDF("ib", "sb"), Seq("ib"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", col("inter") * lit(1.0) /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("j") >= tau)
      .select(col("ia"), col("ib"), round(col("j"), 4).as("j"))
      .orderedRows(col("ia"), col("ib")) // near-dup pairs scale with corpus
  }

  /** 64-bit SimHash per doc + banded near-dup pairs (Hamming ≤ maxDist
    * requires an exact match on one of 4 16-bit chunks when maxDist ≤ 3).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 1)
      .as[(Long, Array[String])]
      .map { case (id, toks) => (id, HashOps.simhash64(toks)) }
      .toDF("doc_id", "simhash")
    val chunked = sh.withColumn("chunk", explode(expr(
        "transform(sequence(0, 3), c -> " +
          "named_struct('c', c, 'v', shiftright(simhash, c*16) & 65535L))")))
      .select(col("doc_id"), col("simhash"), col("chunk.c"), col("chunk.v"))
      .cache()
    chunked.as("x").join(chunked.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxDist)
      .select("ia", "ib", "hamming")
      .orderedRows(col("ia"), col("ib")) // near-dup pairs scale with corpus
  }

  /** Embedding-cosine near-dup pairs via hyperplane-LSH banding with
    * exact verification of candidates. The corpus plants no ≥0.9
    * pairs, so the default tau targets the moderate-similarity regime
    * (narrow 2-bit bands — see SimilarityOps.annLsh scaling note). */
  def embeddingNearDup(emb: DataFrame, tau: Double = 0.45,
      nBands: Int = 8, bandBits: Int = 2): DataFrame = {
    import graft.QueryDef.SmallOrdered
    val vecs = SimilarityOps.withBands(emb, nBands, bandBits).cache()
    // band-join carries IDs ONLY — shuffling 64-d arrays for every
    // candidate pair dominated runtime; vectors re-attach after the
    // pair dedup via (auto-broadcast) joins against the small frame
    val ids = vecs.select(col("vec_id"), col("b"), col("h"))
    val cand = ids.as("x").join(ids.as("y"),
        col("x.b") === col("y.b") && col("x.h") === col("y.h") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("ia"), col("y.vec_id").as("ib"))
      .distinct()
    val va = vecs.select(col("vec_id").as("ia"), col("v").as("va")).distinct()
    val vb = vecs.select(col("vec_id").as("ib"), col("v").as("vb")).distinct()
    graft.functions.CosineSim.register(emb.sparkSession)
    cand.join(va, Seq("ia")).join(vb, Seq("ib"))
      // native Expression (fused codegen loop) instead of interpreted
      // aggregate(zip_with(...)) lambda chains
      .withColumn("sim", round(
        graft.functions.CosineSim.cosine_sim(col("va"), col("vb")), 5))
      .filter(col("sim") >= tau)
      .select("ia", "ib", "sim")
      .orderedRows(col("ia"), col("ib")) // near-dup pairs scale with corpus
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.noOracle("d1_minhash_neardup") { (s, d) =>
      minhashPairs(Tables.documents(s, d))
    },
    QueryDef.noOracle("d2_simhash_neardup") { (s, d) =>
      simhashPairs(Tables.documents(s, d))
    },
    QueryDef.noOracle("d3_embedding_neardup") { (s, d) =>
      embeddingNearDup(Tables.embeddings(s, d))
    }
  )
}
