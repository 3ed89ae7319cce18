package graft

import java.security.MessageDigest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Driver-visible golden hashes for deterministic queries whose output
  * DuckDB cannot re-express in SQL (XXH64 sketches: a2's hyperplane
  * bands, d2's SimHash, t4's fingerprint sketch). The canonical form
  * mirrors the driver's oracle compare — columns sorted by name, rows
  * sorted — so a golden here carries the same evidential weight as a
  * hash_match, pinned at sf0.01 (the correctness-gate SF).
  *
  * `Verify` recomputes each hash from the parquet it just wrote and
  * emits `golden_hashes.json` next to `oracle_sql.json`; ScalaTest
  * (`GoldenHashSpec`) asserts the same equality in-build, so a change
  * to any kernel shows up in BOTH the test run and the round artifact.
  */
object GoldenHashes {

  /** name → sha256 of canonical(result at sf0.01). */
  val expected: Map[String, String] = Map(
    // (a2 carried a golden through r12; r13 promoted it to a1's full
    // DuckDB oracle — at 24 OR-bands the candidate set provably holds
    // every exact top-5 neighbor and the re-rank equals a1's kernel,
    // measured exact at all three SFs — so its golden is retired.)
    // (a3/a6 carried goldens through r13; r14 promoted both to a1's
    // full DuckDB oracle the same way — a3 at nProbe=15 of 16 and a6
    // at m=16/rerank×k=250, each measured candidate-complete at all
    // three SFs (ProbeA3A6) with exact re-rank — goldens retired.)
    "d2_simhash_neardup" -> "9015cca605744505da026aa9349f99673d2d36c6c3c04cc583d1cf8d2309bc35",
    // streaming-only surface (S4 watermark late-drop, S6 keyed state):
    // fixed MemoryStream scenarios, SF-independent by design — see
    // queries/StreamingQueries.scala. (s7/s10/s12/s13 carried goldens
    // through r8; r9 promoted them to SQL oracles over the real
    // tables — the c9→c10 pattern — so their goldens are retired.)
    "s4_late_drop" -> "b6ea593a6207c4647ab107afaa97db3fb1aa1871c05209c2eb56f02ed4e5d7b0",
    "s6_running_counter" -> "9d6bc6af4d658c910702b2b07c67982a1a608dde68216c937367171d27b094c9",
    // (t4 carried a golden through r10; r11 promoted it to a full
    // DuckDB oracle — rolling polynomial fingerprint re-derived from
    // raw text in SQL — so its golden is retired.)
    // t13: BPE trains on the aggregated word dict (lexicographic tie
    // break) and encodes greedily by merge priority — both pure
    // functions of the corpus; hash verified at local[3]/[8]/[32].
    // RE-PINNED r10 when nMerges rose 40 → 1024. r11 raised the
    // request to 8192 and the hash did NOT move — the 31-word test
    // corpus exhausts its pairs far below 1024, so both requests
    // train the identical (exhaustion-bounded) merge list; the full
    // 8192-merge capability is proven on a 20k-word synthetic dict
    // in PipelineOpsSpec instead, where exhaustion can't mask depth.
    "t13_bpe_tokenize" -> "8e5f4be06a054e8bb4124de30a70091a5f97a2da1ecf222adfbe9a72cbf1868e",
    // k1: HLL registers merge by max (commutative/idempotent), so the
    // estimate is a pure function of the value set — pinned hash
    // verified identical across partition layouts (spec).
    // RE-PINNED r12 deliberately: the sketch moved from Spark's HLL++
    // (bias tables ⇒ golden-only) to the engine's HllAgg (classic
    // estimator, SplitMix64, integer-exact register sum), which gained
    // a full DuckDB oracle — the golden stays as the parallelism pin.
    "k1_sketch_distinct" -> "38fda33ca61e1d8501feeafefa068325c7badbd8e98e7762f11533c4b038ce61",
    // m10: MJPEG frames decode through the JVM's own lossy codec, so
    // the raster is codec-defined — no SQL oracle can re-derive it;
    // pinned over the full sf0.01 output (934 frame rows incl. the 10
    // planted ok=false audit rows), layout-independence in spec
    "m10_mjpeg_frames" -> "8e4df975daf9a00718972817034b01fc9dc9721f6647730927151d9f25285a00")

  private def cell(v: Any): String = v match {
    case null => "NULL"
    case d: java.lang.Double => java.lang.Double.toString(d)
    case f: java.lang.Float => java.lang.Float.toString(f)
    case t: java.sql.Timestamp => t.toInstant.toString
    case d: java.sql.Date => d.toString
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case s: scala.collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v) => cell(k) + ":" + cell(v) }.toSeq.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => cell(r.get(i))).mkString("(", ",", ")")
    case other => other.toString
  }

  /** sha256 hex of the sorted-columns / sorted-rows canonical form.
    * collect() is by contract: golden-hashed outputs are bounded
    * (≤ thousands of rows). */
  def hashOf(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(col): _*).collect()
      .map(r => (0 until r.length).map(i => cell(r.get(i))).mkString(""))
      .sorted
    val md = MessageDigest.getInstance("SHA-256")
    rows.foreach { r => md.update(r.getBytes("UTF-8")); md.update('\n'.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }
}
