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
    }
  )
}
