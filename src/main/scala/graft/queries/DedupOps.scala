package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate dedup — the 100 TB scale paths whose ground truths are
  * the exact operators in TextOps (l1/l2) and SimilarityOps.
  *
  * All signature computation is per-row expression work (codegen'd
  * higher-order functions over token arrays — no UDFs, no shuffle);
  * the only shuffles are the band-bucket groupBys, which touch
  * signature-sized rows, never all pairs. Candidate verification runs
  * exact similarity on the candidate set only — the defining property
  * that keeps near-dup detection sub-quadratic at scale.
  */
object DedupOps {

  /** 3-token shingle set per doc (distinct), as array. */
  private def shingled(docs: DataFrame): DataFrame = docs
    .withColumn("toks", split(col("text"), " "))
    .filter(size(col("toks")) >= 3)
    .withColumn("shingles", expr(
      "array_distinct(transform(sequence(0, size(toks)-3), " +
        "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))

  /** MinHash signatures (nSeeds hashes) + LSH banding (bands × rowsPerBand
    * = nSeeds). Returns candidate pairs with their *exact* Jaccard.
    * P(candidate | j=0.8) with 8×4 ≈ 98.5%; recall vs the exact l2
    * output is asserted in DedupOpsSpec. */
  def minhashPairs(docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 4,
      tau: Double = 0.8): DataFrame = {
    val n = bands * rowsPerBand
    val sig = shingled(docs)
      .withColumn("sig", expr(
        s"transform(sequence(0, ${n - 1}), s -> " +
          "array_min(transform(shingles, sh -> xxhash64(concat(cast(s as string), '|', sh)))))"))
      .select(col("doc_id"), col("shingles"), col("sig"))
    val banded = sig
      .withColumn("band", explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> " +
          s"named_struct('b', b, 'h', xxhash64(cast(slice(sig, b*$rowsPerBand+1, $rowsPerBand) as string))))")))
      .select(col("doc_id"), col("shingles"), col("band.b"), col("band.h"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"),
        col("x.shingles").as("sa"), col("y.shingles").as("sb"))
      .distinct()
    cand
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", col("inter") * lit(1.0) /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("j") >= tau)
      .select(col("ia"), col("ib"), round(col("j"), 4).as("j"))
      .orderBy("ia", "ib")
  }

  /** 64-bit SimHash per doc + banded near-dup pairs (Hamming ≤ maxDist
    * requires an exact match on one of 4 16-bit chunks when maxDist ≤ 3).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sh = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 1)
      .withColumn("hashes", expr("transform(toks, t -> xxhash64(t))"))
      // bit k of the simhash = sign of sum over tokens of ±1 for bit k
      // bitwise OR fold (no arithmetic → no ANSI overflow on bit 63)
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, k) ->
          |  acc | shiftleft(if(size(filter(hashes, h -> (shiftright(h, k) & 1L) = 1L)) * 2
          |                     >= size(hashes), 1L, 0L), k))""".stripMargin))
      .select(col("doc_id"), col("simhash"))
    val chunked = sh.withColumn("chunk", explode(expr(
        "transform(sequence(0, 3), c -> " +
          "named_struct('c', c, 'v', shiftright(simhash, c*16) & 65535L))")))
      .select(col("doc_id"), col("simhash"), col("chunk.c"), col("chunk.v"))
    chunked.as("x").join(chunked.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxDist)
      .select("ia", "ib", "hamming")
      .orderBy("ia", "ib")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.noOracle("d1_minhash_neardup") { (s, d) =>
      minhashPairs(Tables.documents(s, d))
    },
    QueryDef.noOracle("d2_simhash_neardup") { (s, d) =>
      simhashPairs(Tables.documents(s, d))
    }
  )
}
