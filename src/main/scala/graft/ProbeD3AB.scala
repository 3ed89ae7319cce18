package graft

import org.apache.spark.sql.SparkSession

/** Era-immune A/B of d3's candidate-form crossover at the r13 32×2-bit
  * geometry: CARRY (vectors ride the band join, cosine per collision
  * row, distinct on survivors) vs IDS-ONLY (bare-id pairs dedupe the
  * ~8×-multiplicity collisions BEFORE vectors re-attach and cosine
  * runs once per pair). The old 20×3 geometry had ~2.5 expected
  * collisions per random pair, where recomputing the cheap dot beat
  * the dedupe shuffle; 32×2 has ~8 — this probe decides whether the
  * crossover default should flip for d3. Alternating passes in one
  * JVM so host era cancels.
  *
  * VERDICT (r13, measured 2026-08-15): carry wins, decisively at
  * scale. sf0.1 warm: ~1.1–1.5 s both forms (a wash). sf1: carry
  * 66–68 s, ids-only 156–190 s ×3 passes — deduping the ~1.6B-row
  * collision stream costs far more than recomputing the fused-codegen
  * cosine per collision. Both forms return identical pairs (16,802).
  *
  * RE-MEASURED r14 after the FirstBandMatch in-stream dedupe replaced
  * both forms' distinct: sf0.1 0.69–0.78 s (from ~1.1–1.5/1.70
  * committed), sf1 carry 24–27 s, ids-only 21–22 s — the duplicate
  * collision visits now die on a bit test, so the forms converge and
  * ids-only (no vector amplification through the shuffle) takes the
  * lead at scale. Pairs unchanged at every SF (candidate SET is
  * untouched by the reshape): 144 at sf0.1, 16,802 at sf1.
  */
object ProbeD3AB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.tinyExchange.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    def run(carry: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = queries.DedupOps.embeddingNearDup(emb,
        carryVectors = Some(carry)).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run(carry = true); run(carry = false) // warm both paths
    for (pass <- 1 to 3; carry <- Seq(true, false)) {
      val (dt, n) = run(carry)
      println(f"d3 carry=$carry%-5s pass$pass $dt%7.3f s  pairs=$n")
    }
    spark.stop()
  }
}
