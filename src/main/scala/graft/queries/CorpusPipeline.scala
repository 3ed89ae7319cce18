package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus preprocessing — the COMPOSITION proof: the
  * operators this engine ships (exact dedup, quality scoring,
  * decontamination, mix-sampling) declared as ONE DataFrame pipeline
  * and optimized as one Catalyst plan, the way a production
  * training-data job actually runs them. Composing, not chaining
  * materializations, is the point at 100 TB: nothing is written
  * between stages, the corpus pays exactly ONE wide shuffle (the
  * dedup window), and every row-wise stage fuses into a codegen span
  * around it. Two rewrites make the composed plan scale where the
  * naive nesting would not — both rest on the same observation, that
  * the quality gates and the contamination predicate are pure
  * functions of `text`:
  *   - gates run BELOW the dedup window (an md5(text) group passes or
  *     fails as a unit, so filtering before the shuffle keeps the
  *     survivors identical while the exchange carries only gated
  *     rows);
  *   - the contamination probe reads the GATED RAW slice, not the
  *     deduped stream (a kept doc's text equals its duplicates', so
  *     the flagged-id set restricted to dedup survivors is unchanged)
  *     — otherwise Catalyst would recompute the window shuffle a
  *     second time inside the broadcast build side. The probe scan is
  *     a 2-column projection; its shingle kernel is map-side only.
  */
object CorpusPipeline {

  val defs: Seq[QueryDef] = Seq(

    // Stage order (execution, not oracle-CTE, order — the rewrites
    // in the scaladoc above prove the results identical):
    //  1. quality gates (length + type-token ratio) — row-wise,
    //     codegen-fused into the scan so the dedup exchange carries
    //     only rows that can survive.
    //  2. exact dedup, keep-first — ROW_NUMBER over PARTITION BY
    //     md5(text): ONE wide shuffle keyed by content hash
    //     (uniformly distributed by construction), keeping full rows;
    //     the groupBy(min)+join-back alternative pays a second
    //     corpus-wide exchange for the row re-attach.
    //  3. decontamination vs the src1 eval slice — the t8 operator
    //     (broadcast eval shingle set, map-side hit dedup) probing
    //     the gated raw slice; the rare hit ids broadcast back into a
    //     left_anti join, so the training stream doesn't shuffle for
    //     this stage and the window subtree isn't recomputed.
    //  4. deterministic mix-sampling (t5 rates) — row-wise filter.
    //  5. per-source count + token totals — the only other exchange,
    //     over a |sources|-sized aggregate.
    QueryDef("p1_preprocess_pipeline",
      """WITH train AS (
        |  SELECT * FROM documents WHERE source <> 'src1'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) = 1),
        |qual AS (
        |  SELECT doc_id, source, lower(text) AS ltext,
        |         CAST(LEN(STRING_SPLIT(text,' ')) AS BIGINT) AS n_tok
        |  FROM train
        |  WHERE LEN(STRING_SPLIT(text,' ')) >= 24
        |    AND LEN(LIST_DISTINCT(STRING_SPLIT(text,' ')))*1.0/LEN(STRING_SPLIT(text,' ')) >= 0.30),
        |esh AS (
        |  SELECT DISTINCT array_to_string(ts[i+1:i+8], ' ') AS shingle
        |  FROM (SELECT STRING_SPLIT(lower(text),' ') AS ts FROM documents WHERE source = 'src1'),
        |       UNNEST(range(0, GREATEST(LEN(ts)-7,0))) AS u(i)),
        |cont AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, array_to_string(ts[i+1:i+8],' ') AS shingle
        |        FROM (SELECT doc_id, STRING_SPLIT(ltext,' ') AS ts FROM qual),
        |             UNNEST(range(0, GREATEST(LEN(ts)-7,0))) AS u(i)) s
        |  JOIN esh USING (shingle)),
        |clean AS (SELECT * FROM qual ANTI JOIN cont USING (doc_id)),
        |mixed AS (
        |  SELECT * FROM clean
        |  WHERE doc_id % 100 <
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4','src5') THEN 25
        |         WHEN source IN ('src6','src7','src8','src9','src10','src11') THEN 50
        |         ELSE 100 END)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM mixed GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val keepFirst = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
      val toks = split(col("text"), " ")
      val gatedRaw = docs.filter(col("source") =!= "src1")
        .withColumn("n_tok", size(toks).cast("long"))
        .withColumn("ttr", size(array_distinct(toks)) * lit(1.0) / size(toks))
        .filter(col("n_tok") >= 24 && col("ttr") >= 0.30)
      val qual = gatedRaw
        .withColumn("rn", row_number().over(keepFirst))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("source"),
          lower(col("text")).as("text"), col("n_tok"))
      val evalSlice = docs.filter(col("source") === "src1")
        .select(col("doc_id"), lower(col("text")).as("text"))
      val contaminated = TextAnalysis
        .decontaminate(
          gatedRaw.select(col("doc_id"), lower(col("text")).as("text")),
          evalSlice)
        .select("doc_id")
      qual.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
        .filter(pmod(col("doc_id"), lit(100)) <
          when(col("source").isin("src0", "src1", "src2", "src3", "src4", "src5"), 25)
            .when(col("source").isin("src6", "src7", "src8", "src9", "src10", "src11"), 50)
            .otherwise(100))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .orderedSmall(col("source")) // one row per source: bounded
    },

    // p2: the v2 pipeline — p1's stages plus the round's new row-wise
    // operators, ending in the TRAINING MANIFEST (per source × split:
    // docs and tokens), i.e. the artifact a pretraining run is
    // actually launched from. Deltas vs p1:
    //  - ALL row-wise gates — length, type-token ratio, and the t9
    //    Gopher top-bigram repetition cut — run in ONE typed kernel
    //    fused into the scan (one tokenize pass computes every
    //    per-row predicate; the declarative form re-splits the text
    //    per gate), emitting only rows that can survive the window.
    //    Gate thresholds compare in integer cross-multiplied form
    //    (distinct×10 ≥ n×3, mx×100 > (n−1)×6) on BOTH engines — no
    //    float boundary can flip a gate.
    //  - the same two p1 rewrites apply unchanged (every gate is a
    //    pure function of text, so an md5(text) group passes or fails
    //    as a unit below the window, and the contamination probe
    //    reads the kernel-gated raw slice without recomputing the
    //    window inside the broadcast build side);
    //  - t10's multiplicative-hash split assignment is a free row-wise
    //    projection on the survivors.
    // The corpus still pays exactly ONE wide keyed shuffle (the dedup
    // window); the manifest aggregate is sources×3-sized.
    QueryDef("p2_manifest_pipeline",
      """WITH train AS (
        |  SELECT * FROM documents WHERE source <> 'src1'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) = 1),
        |qual AS (
        |  SELECT doc_id, source, text, lower(text) AS ltext,
        |         CAST(LEN(STRING_SPLIT(text,' ')) AS BIGINT) AS n_tok
        |  FROM train
        |  WHERE LEN(STRING_SPLIT(text,' ')) >= 24
        |    AND LEN(LIST_DISTINCT(STRING_SPLIT(text,' ')))*10 >= LEN(STRING_SPLIT(text,' '))*3),
        |bg AS (
        |  SELECT doc_id, ts[i+1] || ' ' || ts[i+2] AS g, LEN(ts)-1 AS nb
        |  FROM (SELECT doc_id, STRING_SPLIT(text,' ') ts FROM qual),
        |       UNNEST(range(0, GREATEST(LEN(ts)-1,0))) u(i)),
        |bga AS (
        |  SELECT doc_id, MAX(c) mx, MAX(nb) nb
        |  FROM (SELECT doc_id, g, nb, COUNT(*) c FROM bg GROUP BY 1,2,3)
        |  GROUP BY 1),
        |unflagged AS (SELECT doc_id FROM bga WHERE NOT (mx*100 > nb*6)),
        |clean0 AS (SELECT * FROM qual SEMI JOIN unflagged USING (doc_id)),
        |esh AS (
        |  SELECT DISTINCT array_to_string(ts[i+1:i+8], ' ') AS shingle
        |  FROM (SELECT STRING_SPLIT(lower(text),' ') AS ts FROM documents WHERE source = 'src1'),
        |       UNNEST(range(0, GREATEST(LEN(ts)-7,0))) AS u(i)),
        |cont AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, array_to_string(ts[i+1:i+8],' ') AS shingle
        |        FROM (SELECT doc_id, STRING_SPLIT(ltext,' ') AS ts FROM clean0),
        |             UNNEST(range(0, GREATEST(LEN(ts)-7,0))) AS u(i)) s
        |  JOIN esh USING (shingle)),
        |clean AS (SELECT * FROM clean0 ANTI JOIN cont USING (doc_id)),
        |mixed AS (
        |  SELECT * FROM clean
        |  WHERE doc_id % 100 <
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4','src5') THEN 25
        |         WHEN source IN ('src6','src7','src8','src9','src10','src11') THEN 50
        |         ELSE 100 END),
        |assigned AS (
        |  SELECT source,
        |    CASE WHEN ((doc_id & 2147483647) * 2654435761) % 1000 < 800 THEN 'train'
        |         WHEN ((doc_id & 2147483647) * 2654435761) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split, n_tok
        |  FROM mixed)
        |SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM assigned GROUP BY source, split ORDER BY source, split""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val gatedRaw = gatedDocs(docs.filter(col("source") =!= "src1"))
      val keepFirst = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
      val deduped = gatedRaw
        .withColumn("rn", row_number().over(keepFirst))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("source"), col("n_tok"))
      val evalSlice = docs.filter(col("source") === "src1")
        .select(col("doc_id"), lower(col("text")).as("text"))
      val contaminated = TextAnalysis
        .decontaminate(
          gatedRaw.select(col("doc_id"), lower(col("text")).as("text")),
          evalSlice)
        .select("doc_id")
      val mix = pmod(col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L))
      deduped.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
        .filter(pmod(col("doc_id"), lit(100)) <
          when(col("source").isin("src0", "src1", "src2", "src3", "src4", "src5"), 25)
            .when(col("source").isin("src6", "src7", "src8", "src9", "src10", "src11"), 50)
            .otherwise(100))
        .withColumn("split",
          when(mix < 800, "train").when(mix < 900, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .orderedSmall(col("source"), col("split")) // sources×3: bounded
    },

    // p3: the INCREMENTAL form of p2 — the shape a production corpus
    // actually runs DAILY: an already-ingested base plus a new delta
    // batch, producing the manifest ADDITIONS. The base side never
    // pays the pipeline and never shuffles: its content hashes fold
    // once into d6's tree-aggregated Bloom bitmap (+ exact
    // confirmation pass), so the full pipeline cost — gates, dedup,
    // split assignment — scales with the DELTA, not the corpus. Gates
    // run before the dedup probe (they commute with content-hash
    // dedup and shrink the probe stream); keep-first within the batch
    // is d6's QUALIFY semantics.
    QueryDef("p3_incremental_manifest",
      """WITH delta AS (SELECT * FROM documents WHERE doc_id % 7 = 0),
        |base AS (SELECT MD5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
        |qual AS (
        |  SELECT doc_id, source, text,
        |         CAST(LEN(STRING_SPLIT(text,' ')) AS BIGINT) AS n_tok
        |  FROM delta
        |  WHERE LEN(STRING_SPLIT(text,' ')) >= 24
        |    AND LEN(LIST_DISTINCT(STRING_SPLIT(text,' ')))*10 >= LEN(STRING_SPLIT(text,' '))*3),
        |bg AS (
        |  SELECT doc_id, ts[i+1] || ' ' || ts[i+2] AS g, LEN(ts)-1 AS nb
        |  FROM (SELECT doc_id, STRING_SPLIT(text,' ') ts FROM qual),
        |       UNNEST(range(0, GREATEST(LEN(ts)-1,0))) u(i)),
        |bga AS (
        |  SELECT doc_id, MAX(c) mx, MAX(nb) nb
        |  FROM (SELECT doc_id, g, nb, COUNT(*) c FROM bg GROUP BY 1,2,3)
        |  GROUP BY 1),
        |clean AS (
        |  SELECT * FROM qual SEMI JOIN (SELECT doc_id FROM bga WHERE NOT (mx*100 > nb*6))
        |  USING (doc_id)),
        |fresh AS (
        |  SELECT * FROM clean c
        |  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.h = MD5(c.text))
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) = 1),
        |assigned AS (
        |  SELECT source,
        |    CASE WHEN ((doc_id & 2147483647) * 2654435761) % 1000 < 800 THEN 'train'
        |         WHEN ((doc_id & 2147483647) * 2654435761) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split, n_tok
        |  FROM fresh)
        |SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM assigned GROUP BY source, split ORDER BY source, split""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val gated = gatedDocs(docs.filter(pmod(col("doc_id"), lit(7)) === 0))
        .withColumn("h", md5(col("text")))
        .select("doc_id", "source", "n_tok", "h")
      val baseKeys = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .select(md5(col("text")).as("h"))
      val mix = pmod(col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L))
      DedupOps.bloomDeltaDedup(baseKeys, gated, "h", "doc_id")
        .withColumn("split",
          when(mix < 800, "train").when(mix < 900, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .orderedSmall(col("source"), col("split")) // sources×3: bounded
    },

    // p4: PRETRAINING-BATCH MATERIALIZATION — the capstone after the
    // manifest pipelines: gate → exact-dedup → epoch shuffle order
    // (t15) → global token-stream prefix sum (t16's two-pass
    // distributed scheme) → slice into fixed 512-token blocks → the
    // PER-BLOCK manifest a data loader reads (spans touching the
    // block, tokens filled, source mix). Every block's token count is
    // derived by clipping each doc+EOD span [tok_start,
    // tok_start+n_tok+1) against the block's [512b, 512(b+1)) window,
    // so Σ tok_filled equals the whole stream length — conservation
    // is spec-asserted. Cost shape at 100 TB: one content-hash window
    // shuffle (dedup), one range sort (the epoch order), a
    // |partitions|-row collect for the prefix offsets, and a
    // block-keyed aggregate over the ~n_tok/512-fold span explosion —
    // no corpus-sized collect, no single-task window.
    QueryDef("p4_block_manifest",
      """WITH g AS (
        |  SELECT doc_id, source, text,
        |         CAST(LEN(STRING_SPLIT(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents WHERE LEN(STRING_SPLIT(text,' ')) >= 5),
        |dd AS (SELECT * FROM g
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) = 1),
        |o AS (SELECT doc_id, source, n_tok,
        |        CAST(COALESCE(SUM(n_tok + 1) OVER (
        |          ORDER BY ((doc_id & 2147483647) * 2654435761) % 1048576, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS tok_start
        |      FROM dd),
        |b AS (SELECT o.*, CAST(u.b AS BIGINT) AS block_id
        |      FROM o, UNNEST(generate_series(tok_start // 512,
        |                       (tok_start + n_tok) // 512)) AS u(b))
        |SELECT block_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(SUM(LEAST(tok_start + n_tok + 1, (block_id + 1) * 512)
        |           - GREATEST(tok_start, block_id * 512)) AS BIGINT) AS tok_filled,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val wDedup = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val sorted = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .filter(col("n_tok") >= 5) // gate below the dedup shuffle
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("n_tok"), col("source"))
        .withColumn("h", pmod(col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1048576L)))
        .orderBy(col("h"), col("doc_id"))
        .select("doc_id", "n_tok", "source")
        .as[(Long, Long, String)](graft.Enc.longLongStr)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // two-pass distributed prefix sum over the epoch-ordered stream
      // (t16): per-partition token totals, then broadcast offsets.
      // Both passes must see the SAME range-partitioned sort sample,
      // hence the persist; the eager localCheckpoint below pins the
      // blocks-sized manifest so the events-sized cache can be
      // released immediately (ADVICE r9: repeated bench passes were
      // accumulating never-unpersisted blocks for the JVM's lifetime).
      try {
        val totals = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
          var toks = 0L
          it.foreach { case (_, nt, _) => toks += nt + 1 }
          Iterator((i, toks))
        }.collect().sortBy(_._1)
        val bc = s.sparkContext.broadcast(
          totals.scanLeft(0L)(_ + _._2).dropRight(1))
        sorted.rdd.mapPartitionsWithIndex { (i, it) =>
          var tok = bc.value(i)
          it.map { case (id, nt, src) =>
            val st = tok; tok += nt + 1; (id, st, nt, src)
          }
        }.toDF("doc_id", "tok_start", "n_tok", "source")
          // span → touched blocks: bounded ~n_tok/512-fold Generate
          .select(col("source"), col("tok_start"), col("n_tok"),
            explode(sequence(expr("tok_start div 512"),
              expr("(tok_start + n_tok) div 512"))).as("block_id"))
          .groupBy("block_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(least(col("tok_start") + col("n_tok") + 1, (col("block_id") + 1) * 512)
              - greatest(col("tok_start"), col("block_id") * 512)).as("tok_filled"),
            countDistinct("source").as("n_sources"))
          .localCheckpoint() // eager — runs pass 2 while `sorted` is cached
          .orderedRows(col("block_id")) // blocks scale with the stream
      } finally sorted.unpersist(blocking = false)
    },

    // p5 (r11): RENDEZVOUS (HRW) SHARDING — the data-placement
    // primitive (Thaler & Ravishankar '98, the scheme behind
    // consistent cache/shard assignment): each doc goes to the shard
    // maximizing h(doc, shard), so GROWING the fleet 8 → 9 moves
    // EXACTLY the docs the new shard wins (~1/9 of the corpus) and
    // every mover lands ON the new shard — no doc ever moves between
    // surviving shards, unlike doc_id % N where nearly all docs
    // reassign. The hash is pure BIGINT arithmetic (one multiply-add
    // round, one modular SQUARE for nonlinearity — an affine-in-shard
    // hash fails the minimal-disruption property, measured — then a
    // final multiply-add, all mod the prime 1e9+7, no 64-bit wrap
    // anywhere), so both engines compute identical values and the
    // argmax is exact. The entry emits both placements so the
    // minimal-move property is IN the hashed output. Scale shape:
    // pure per-row codegen expressions (array of structs + array_max
    // — no UDF), zero shuffle before the output sort.
    QueryDef("p5_rendezvous_shards", {
      val P = 1000000007L
      s"""WITH hs AS (
         |  SELECT doc_id, j.j AS j,
         |    ((((doc_id & 2147483647)*2654435761 + j.j*40503 + 7) % $P) *
         |     (((doc_id & 2147483647)*2654435761 + j.j*40503 + 7) % $P) % $P * 1000003 + j.j) % $P AS h
         |  FROM documents, UNNEST(generate_series(0, 8)) AS j(j)),
         |s8 AS (SELECT doc_id, j AS shard8 FROM
         |       (SELECT doc_id, j, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, j DESC) rn
         |        FROM hs WHERE j < 8) WHERE rn = 1),
         |s9 AS (SELECT doc_id, j AS shard9 FROM
         |       (SELECT doc_id, j, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, j DESC) rn
         |        FROM hs) WHERE rn = 1)
         |SELECT s8.doc_id, CAST(shard8 AS INT) AS shard8,
         |       CAST(shard9 AS INT) AS shard9,
         |       shard8 <> shard9 AS moved
         |FROM s8 JOIN s9 USING (doc_id) ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val P = 1000000007L
      def hExpr(j: Int): org.apache.spark.sql.Column = {
        val x = (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L) + lit(j * 40503L + 7L)) % P
        (x * x % P * lit(1000003L) + lit(j.toLong)) % P
      }
      def shardOf(n: Int) =
        array_max(array((0 until n).map(j =>
          struct(hExpr(j).as("h"), lit(j).as("j"))): _*)).getField("j")
      Tables.documents(s, d)
        .select(col("doc_id"),
          shardOf(8).as("shard8"), shardOf(9).as("shard9"))
        .withColumn("moved", col("shard8") =!= col("shard9"))
        .orderedRows(col("doc_id")) // one row per doc: scales
    },

    // p6: DATASET CARD (r12) — the datasheet a training corpus ships
    // with: per-source AND grand-total (ROLLUP) doc/char/token counts,
    // language spread, exact-duplicate rate, and length quantiles, all
    // in ONE aggregation pass over the corpus (a naive card runs five
    // separate scans; at 100 TB the difference is the whole job). The
    // multi-distinct (lang, text) + percentile mix plans through one
    // Expand — corpus scanned once; rollup rows are sources+1.
    QueryDef("p6_dataset_card",
      """SELECT COALESCE(source, 'TOTAL') AS source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS dup_docs,
        |  ROUND(QUANTILE_CONT(n_chars, 0.5), 3) AS p50_chars,
        |  ROUND(QUANTILE_CONT(n_chars, 0.95), 3) AS p95_chars
        |FROM documents GROUP BY ROLLUP(source)
        |ORDER BY source""".stripMargin) { (s, d) =>
      datasetCard(Tables.documents(s, d))
        .orderedSmall(col("source")) // sources + 1 rows
    },

    // p7: LEAKAGE-SAFE train/val/test split — the composition the
    // split (t10) and near-dup clustering (d4) exist FOR: a doc's
    // split is decided by its near-dup COMPONENT representative, not
    // its own id, so two near-duplicates can never straddle
    // train/test (the eval-contamination leak t8 scrubs after the
    // fact is prevented by construction here). Representative = d4's
    // min-doc_id cluster label, the doc's own id when unclustered;
    // the split rule is t10's Knuth-hash bucketing applied to the
    // representative — pure expression, no driver state. Scale
    // shape: the cluster frame is PAIRS-sized (tiny next to the
    // corpus); the corpus pays one left join on doc_id plus the
    // row-wise hash — no new corpus-wide shuffle beyond the join,
    // and the leak-freedom is structural (rep is constant within a
    // component), not a post-hoc audit.
    QueryDef("p7_leakage_safe_split",
      DedupOps.ComponentsCte +
        """,
          |comp AS (SELECT u AS doc_id, MIN(m) AS rep FROM walk GROUP BY u),
          |assigned AS (
          |  SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep
          |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
          |SELECT doc_id, rep,
          |  CASE WHEN ((rep & 2147483647) * 2654435761) % 1000 < 800 THEN 'train'
          |       WHEN ((rep & 2147483647) * 2654435761) % 1000 < 900 THEN 'val'
          |       ELSE 'test' END AS split
          |FROM assigned ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      leakageSafeSplit(docs,
        DedupOps.clusterPairs(DedupOps.minhashPairs(docs).select("ia", "ib")))
    }
  )

  /** p7's assignment over any (doc_id) corpus frame and a
    * (doc_id, cluster_id) component labeling — exposed for the
    * zero-cross-split-pair spec. */
  private[queries] def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame,
      clusters: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val rep = docs.select(col("doc_id"))
      .join(clusters.withColumnRenamed("cluster_id", "rep"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
    val mix = pmod(col("rep").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L))
    rep.select(col("doc_id"), col("rep"),
        when(mix < 800, "train").when(mix < 900, "val").otherwise("test")
          .as("split"))
      .orderedRows(col("doc_id"))
  }

  /** The p6 card aggregation over any (doc_id, text, lang, source,
    * n_chars) frame — exposed for the one-scan plan spec. */
  private[queries] def datasetCard(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.rollup("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("chars"),
        sum(size(split(col("text"), " ", -1)).cast("long")).as("tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("text"))).as("dup_docs"),
        round(expr("percentile(n_chars, 0.5D)"), 3).as("p50_chars"),
        round(expr("percentile(n_chars, 0.95D)"), 3).as("p95_chars"))
      .select(coalesce(col("source"), lit("TOTAL")).as("source"),
        col("n_docs"), col("chars"), col("tokens"), col("n_langs"),
        col("dup_docs"), col("p50_chars"), col("p95_chars"))

  /** Fused row-wise quality gates over (doc_id, source, text) — ONE
    * JIT'd pass per row: tokenize once, evaluate the length, TTR, and
    * Gopher top-bigram gates (thresholds in integer cross-multiplied
    * form so no float boundary can flip a row). Shared by p2 and p3;
    * the fused-kernel≡naive-nesting equivalence is spec-pinned. */
  private[queries] def gatedDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("source"), col("text"))
      .fanOut // single-row-group scan: spread the gate kernel
      .as[(Long, String, String)](graft.Enc.longStrStr)
      .flatMap { case (id, src, text) =>
        val ts = text.split(" ", -1)
        val n = ts.length
        if (n < 24) Iterator.empty
        else {
          val seen = new java.util.HashSet[String]()
          var i = 0
          while (i < n) { seen.add(ts(i)); i += 1 }
          if (seen.size * 10 < n * 3) Iterator.empty
          else {
            val bi = new java.util.HashMap[String, Int]()
            var mx = 0
            var j = 0
            while (j < n - 1) {
              val c = bi.merge(ts(j) + " " + ts(j + 1), 1, Integer.sum)
              if (c > mx) mx = c
              j += 1
            }
            if (mx * 100 > (n - 1) * 6) Iterator.empty
            else Iterator.single((id, src, text, n.toLong))
          }
        }
      }(graft.Enc.longStrStrLong)
      .toDF("doc_id", "source", "text", "n_tok")
}
