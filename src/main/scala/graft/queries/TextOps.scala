package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-pipeline text surface L1–L5 (SURVEY.md §2.3) over `documents`
  * and `embeddings`. These are the *exact* paths (oracle-checked at
  * sf0.01); the approximate scale paths (MinHash-LSH, SimHash,
  * LSH-bucketed ANN) live in `DedupOps`/`SimilarityOps`.
  */
object TextOps {

  /** Exact shingle-Jaccard ≥ 0.8 pair SQL — the oracle for BOTH the
    * exact l2 operator and the MinHash-LSH scale path d1: at τ=0.8
    * d1's banding has (asserted) 100% recall and its verify step is
    * the exact Jaccard, so its output equals the exact pairs. */
  val JaccardPairsSql: String =
    """WITH tok AS (SELECT doc_id, STRING_SPLIT(text,' ') toks FROM documents),
      |shx AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks)-2),
      |              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle FROM tok),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM shx),
      |card AS (SELECT doc_id, COUNT(*) c FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id ia, b.doc_id ib, COUNT(*) i
      |          FROM sh a JOIN sh b ON a.shingle=b.shingle AND a.doc_id < b.doc_id GROUP BY 1,2)
      |SELECT ia, ib, ROUND(i*1.0/(ca.c + cb.c - i), 4) AS j
      |FROM inter JOIN card ca ON ca.doc_id=ia JOIN card cb ON cb.doc_id=ib
      |WHERE i*1.0/(ca.c + cb.c - i) >= 0.8
      |ORDER BY ia, ib""".stripMargin

  /** Exact 3-token-shingle Jaccard ≥ τ pair join over any frame with
    * (doc_id LONG, text STRING) — the l2 operator's engine, exposed so
    * callers (and the randomized exactness spec) can run it on
    * arbitrary corpora. τ is fixed at 0.8: the integer prefix/length
    * bounds below are specialized to 4/5 (see prefixLen08).
    */
  def jaccardPairs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // Exact 3-token-shingle Jaccard ≥ τ=0.8 via prefix filtering
    // (the AllPairs/PPJoin family of exact set-similarity joins):
    // J(A,B) ≥ τ ⟹ |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉ ≥ ⌈τ·|A|⌉, and the
    // smallest common shingle under a global total order must then
    // sit within each side's first |S| − ⌈τ|S|⌉ + 1 shingles. So the
    // inverted index holds only that ~20% prefix (hash order = the
    // global order), the self-join emits a small candidate set, and
    // exact verification (array_intersect on the full sorted sets)
    // touches candidates only. Same shape at 100 TB: prefix rows and
    // candidate IDs shuffle, never all shingle pairs.
    // Shingling runs in a typed map (JIT'd primitive loops): the
    // Catalyst HOF form interprets its lambda per element — measured
    // ~8× slower over the corpus (see graft.functions.HashOps). Not
    // cached: recompute is cheaper than array-column materialization,
    // and the self-join sides reuse one shuffle via ReuseExchange.
    // Shingles live as their 64-bit hash, not the ~20-byte string —
    // smaller shuffle (2^-64 collision odds; the oracle hash-compare
    // would surface one instantly).
    val s = docs.sparkSession
    import s.implicits._
    import graft.functions.HashOps
    // Prefix rows CARRY the full sorted hash set (the d1-documented
    // sets-on-the-wire tradeoff: ~|prefix|× volume vs IDs-only, bought
    // back by verifying IN-STREAM on the join output): the shingle
    // kernel runs ONCE, there is no sets subtree to broadcast and no
    // candidate→re-attach join pair, and duplicate candidates (a pair
    // sharing several prefix hashes) collapse on the finished scalar
    // triple — dedup AFTER the cheap verify beats a distinct+re-attach
    // round-trip at every measured SF. Prefix length
    // |S| − ⌈0.8|S|⌉ + 1 in integer arithmetic — double
    // ceil(0.8*35)=29 would silently shorten the prefix.
    val pref = docs
      .select(col("doc_id"), col("text"))
      .fanOut // single-row-group scan: spread the shingle kernel
      .as[(Long, String)](graft.Enc.longStr)
      .flatMap { case (id, text) =>
        val sh = HashOps.shingleHashes(text, 3)
        val pl = HashOps.prefixLen08(sh.length)
        Iterator.tabulate(math.min(pl, sh.length))(i => (id, sh, sh(i)))
      }(graft.Enc.longLongArrLong)
      .toDF("doc_id", "sh", "p")
    // Explicit repartition(p) on the full parallelism, not the session
    // shuffle default: the verify (array_intersect per candidate) runs
    // inside this join stage, and the sides are canonically identical
    // so they still share ONE exchange (ReuseExchange).
    val side = pref.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("p"))
    // Verify = one codegen'd merge walk over the sorted hash sets
    // (SortedIntersectSizeIfFirst): |A∩B| plus the PPJoin positional
    // dedup in the same pass — the result is -1 unless the joined
    // prefix hash is the SMALLEST common hash, so each surviving pair
    // appears exactly once and the old `.distinct()` exchange (and the
    // per-row hash set array_intersect built) are both gone.
    graft.functions.SortedIntersectSizeIfFirst.register(docs.sparkSession)
    import graft.functions.SortedIntersectSizeIfFirst.sorted_intersect_size_if_first
    side.select(col("doc_id").as("ia"), col("sh").as("sa"), col("p"))
      .join(side.select(col("doc_id").as("ib"), col("sh").as("sb"), col("p"))
        .hint("shuffle_hash"), Seq("p"))
      .filter(col("ia") < col("ib") &&
        expr("least(size(sa), size(sb)) >= (4 * greatest(size(sa), size(sb)) + 4) div 5"))
      .withColumn("i",
        sorted_intersect_size_if_first(col("sa"), col("sb"), col("p")))
      .filter(col("i") >= 0)
      .withColumn("jac", col("i") * lit(1.0) /
        (size(col("sa")) + size(col("sb")) - col("i")))
      .filter(col("jac") >= 0.8)
      .select(col("ia"), col("ib"), round(col("jac"), 4).as("j"))
      .orderedRows(col("ia"), col("ib")) // near-dup pairs scale with corpus
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("l1_exact_dedup",
      """SELECT COUNT(*) AS total, COUNT(DISTINCT MD5(text)) AS uniq FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .agg(count(lit(1)).as("total"), countDistinct(md5(col("text"))).as("uniq"))
    },

    // The dedup MATERIALIZATION (not just the count): one surviving
    // doc_id per distinct content, keep-first policy. One hash-groupBy
    // — the same shape at any scale.
    QueryDef("l1b_dedup_keep_first",
      """SELECT MIN(doc_id) AS doc_id FROM documents
        |GROUP BY MD5(text) ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
        .orderedRows(col("doc_id")) // survivors scale with corpus
    },

    QueryDef("l2_jaccard_pairs", JaccardPairsSql) { (s, d) =>
      jaccardPairs(Tables.documents(s, d))
    },

    QueryDef("l3_cosine_topk",
      """WITH pairs AS (SELECT a.vec_id ia, b.vec_id ib,
        |  LIST_COSINE_SIMILARITY(a.embedding, b.embedding) sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT ia, ib, ROUND(CAST(sim AS DOUBLE),5) AS sim FROM pairs ORDER BY sim DESC, ia, ib LIMIT 20""".stripMargin) { (s, d) =>
      // Brute-force exact cosine top-k via the broadcast-and-scan
      // kernel (primitive loops; see VectorOps). Scale path =
      // SimilarityOps LSH bucketing; this is the ground-truth baseline.
      graft.functions.VectorOps.cosineTopKPairs(Tables.embeddings(s, d), 20)
    },

    QueryDef("l4_text_stats",
      """SELECT lang, COUNT(*) AS c, ROUND(AVG(n_chars),2) AS avg_chars,
        |       ROUND(AVG(LENGTH(STRING_SPLIT(text,' '))),2) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("c"),
          round(avg("n_chars"), 2).as("avg_chars"),
          round(avg(size(split(col("text"), " ")).cast("double")), 2).as("avg_tokens"))
        .orderedSmall(col("lang"))
    },

    QueryDef("l5_tfidf_top3",
      """WITH tok AS (SELECT doc_id, source, UNNEST(STRING_SPLIT(text,' ')) term FROM documents),
        |tf AS (SELECT source, term, COUNT(*) tf FROM tok GROUP BY 1,2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) df FROM tok GROUP BY 1),
        |n AS (SELECT COUNT(*) n FROM documents),
        |scored AS (SELECT source, term, ROUND(tf * LN((SELECT n FROM n)*1.0/df), 6) s
        |           FROM tf JOIN df USING(term))
        |SELECT source, term, s FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY s DESC, term) rn FROM scored) t
        |WHERE rn<=3 ORDER BY source, rn""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val nDf = docs.agg(count(lit(1)).as("n"))
      // DOC-GRAIN partials, not a token explode: one typed-kernel pass
      // emits (source, term, in-doc count) per distinct term per doc —
      // TF sums the counts by (source, term) and DF counts the rows by
      // term, both from the SAME stream (ReuseExchange shares the
      // fan-out shuffle), both map-side-combined down to vocabulary-
      // sized partials. The raw token stream never shuffles, so a hot
      // term ("the") costs nothing extra at 100× — the skew bomb of a
      // repartition-by-term plan, and the 2×-token-stream shuffle of
      // an explode + countDistinct plan, are both structurally gone.
      // tf⋈df is hintless: vocabulary-sized aggregate sides, never a
      // broadcast gamble on vocabulary growth.
      // No fanOut here: tokenizing 5k docs costs less than the two
      // stages a redistribution adds — the partial aggregate collapses
      // the kernel output to vocabulary-sized rows inside the scan
      // task either way. (At real scale the scan splits by file/row
      // group and the kernel is already parallel.)
      val perDoc = docs.select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)](graft.Enc.longStrStr)
        .flatMap { case (_, src, text) =>
          graft.functions.HashOps.termCounts(text).map { case (t, c) => (src, t, c) }
        }(graft.Enc.strStrInt)
        .toDF("source", "term", "cnt")
      // One aggregation to (term, source) grain carries BOTH facts:
      // tf = Σ in-doc counts, dfp = #docs for the (term, source) pair.
      // Each doc has exactly one source, so df(term) = Σ_src dfp — a
      // window over term, NOT a tf⋈df self-join (whose two consumer
      // subtrees Catalyst prunes differently, defeating ReuseExchange
      // and running the tokenize stage twice).
      val g1 = perDoc.groupBy("term", "source")
        .agg(sum("cnt").as("tf"), count(lit(1)).as("dfp"))
      // Ranking happens on the ROUNDed score (both sides) so float
      // last-ulp noise can't reorder the top-3.
      val scored = g1
        .withColumn("df", sum("dfp").over(Window.partitionBy("term")))
        .crossJoin(broadcast(nDf))
        .withColumn("s", round(col("tf") * log(col("n") * lit(1.0) / col("df")), 6))
      val w = Window.partitionBy("source").orderBy(col("s").desc, col("term"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderedSmall(col("source"), col("rn"))
        .select("source", "term", "s")
    }
  )
}
