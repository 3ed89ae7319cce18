package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch equivalents of the streaming surface S1–S3/S5 (SURVEY.md
  * §2.3) over the `events` table. The true streaming forms (readStream
  * + watermark + window/session_window/dropDuplicates) live in
  * `graft.streaming` and are asserted batch-equivalent in ScalaTest;
  * these batch plans are the oracle-checked contract.
  *
  * `events.ts` is nanosecond parquet; both sides truncate to µs
  * (Tables.events / CAST(ts AS TIMESTAMP)) so bucket edges agree.
  */
object EventOps {

  /** k1's DuckDB oracle: re-derives the engine's WHOLE HLL pipeline —
    * SplitMix64 hash (wrapping 64-bit arithmetic in HUGEINT, 32-bit
    * limb products, the d2 technique), register index/rank extraction
    * (top-12-bit index, leading-zero rank via an exact CASE ladder —
    * never float log2), register-max over a full 4096-register grid,
    * and the estimate as the IDENTICAL literal expression HllAgg
    * evaluates (one double division of exact integers; linear-counting
    * branch on m·ln(m/V)). Declared above `defs` (object-init order). */
  private val K1HllOracleSql: String = {
    import SqlHash.{Mod, mul64, xor64, shr}
    val (c1, c2) = ("13787848793156543929", "10723151780598845931")
    val rankCases = (1 to 40)
      .map(r => s"WHEN w >= ${BigInt(1) << (64 - r)} THEN $r").mkString(" ")
    s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
       |ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_users FROM du GROUP BY 1),
       |h0 AS (SELECT event_type, ((CAST(user_id AS HUGEINT) % $Mod + $Mod) % $Mod) AS u FROM du),
       |z0 AS (SELECT event_type, (u + 11400714819323198485) % $Mod AS z FROM h0),
       |z1 AS (SELECT event_type, ${mul64(xor64("z", shr("z", 30)), c1)} AS z FROM z0),
       |z2 AS (SELECT event_type, ${mul64(xor64("z", shr("z", 27)), c2)} AS z FROM z1),
       |hh AS (SELECT event_type, ${xor64("z", shr("z", 31))} AS h FROM z2),
       |rg AS (SELECT event_type, CAST(h // 4503599627370496 AS BIGINT) AS idx,
       |              (h % 4503599627370496) * 4096 AS w FROM hh),
       |rk AS (SELECT event_type, idx, CASE $rankCases ELSE 41 END AS rank FROM rg),
       |mx AS (SELECT event_type, idx, MAX(rank) AS mr FROM rk GROUP BY 1, 2),
       |grid AS (SELECT et.event_type, g.idx FROM (SELECT DISTINCT event_type FROM du) et
       |         CROSS JOIN (SELECT UNNEST(range(4096)) AS idx) g),
       |fr AS (SELECT grid.event_type, grid.idx, COALESCE(mx.mr, 0) AS mr FROM grid
       |       LEFT JOIN mx ON grid.event_type = mx.event_type AND grid.idx = mx.idx),
       |agg AS (SELECT event_type, CAST(SUM(CAST(1 AS BIGINT) << (41 - mr)) AS BIGINT) AS s,
       |               CAST(SUM(CASE WHEN mr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v FROM fr GROUP BY 1),
       |est AS (SELECT event_type, v,
       |   0.7213/(1.0 + 1.079/4096.0) * 4096.0 * 4096.0 * 2199023255552.0 / CAST(s AS DOUBLE) AS e FROM agg)
       |SELECT est.event_type,
       |  CAST(ROUND(CASE WHEN v > 0 AND e <= 10240.0 THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE)) ELSE e END) AS BIGINT) AS approx_users,
       |  ex.exact_users
       |FROM est JOIN ex ON est.event_type = ex.event_type ORDER BY 1""".stripMargin
  }

  /** k4's count-min geometry: D=4 hash rows × W=256 buckets (top-8
    * hash bits). Row i hashes with the codegen'd built-in
    * xxhash64(lit(i), key) — Spark chains multi-arg xxhash64 as
    * hashLong(key, hashLong(i, 42)), so the oracle starts each row
    * from the PRECOMPUTED constant hashLong(i, 42) and re-derives one
    * hashLong stage per row (the t23 technique). */
  private val CmsD = 4
  private val CmsLogW = 8

  /** Spark's XXH64.hashLong (public algorithm: xxHash64 one-lane
    * 8-byte path) evaluated at SQL-BUILD time for the per-row seed
    * constants the oracle embeds as literals. */
  private def xxh64Long(l: Long, seed: Long): Long = {
    val (p1, p2, p3, p4, p5) = (-7046029288634856825L, -4417276706812531889L,
      1609587929392839161L, -8796714831421723037L, 2870177450012600261L)
    var h = seed + p5 + 8L
    h ^= java.lang.Long.rotateLeft(l * p2, 31) * p1
    h = java.lang.Long.rotateLeft(h, 27) * p1 + p4
    h ^= h >>> 33; h *= p2; h ^= h >>> 29; h *= p3; h ^= h >>> 32
    h
  }

  /** k4's DuckDB oracle: re-derives the count-min pipeline — per hash
    * row, ONE XXH64 hashLong stage from the embedded constant seed
    * (chained HUGEINT CTE stages, the t23 technique), top-8-bit bucket,
    * the full counter grid as a GROUP BY, and each queried key's
    * estimate as the min of its D counters. Exact counts ride along as
    * the audit column; the hash must land every event in the same cell
    * on both engines for the grid (and so the minima) to agree. */
  private lazy val K4CmsOracleSql: String = {
    import SqlHash._
    val modB = BigInt(Mod)
    val starts = (0 until CmsD).map { i =>
      val s = BigInt(xxh64Long(i.toLong, 42L)).mod(modB)
      ((s + BigInt(P5) + 8) mod modB).toString
    }
    val seedRows = starts.zipWithIndex
      .map { case (st, i) => s"($i, CAST($st AS HUGEINT))" }.mkString(", ")
    val w = BigInt(1) << (64 - CmsLogW)
    s"""WITH ev AS (SELECT user_id FROM events),
       |seeds AS (SELECT * FROM (VALUES $seedRows) s(i, st)),
       |h0 AS (SELECT user_id, i, st,
       |       ((CAST(user_id AS HUGEINT) % $Mod + $Mod) % $Mod) AS u
       |       FROM ev CROSS JOIN seeds),
       |k1 AS (SELECT user_id, i, st, ${mul64(rotl(mul64("u", P2), 31), P1)} AS k FROM h0),
       |s1 AS (SELECT user_id, i, ${xor64("st", "k")} AS h FROM k1),
       |s2 AS (SELECT user_id, i, (${mul64(rotl("h", 27), P1)} + $P4) % $Mod AS h FROM s1),
       |a1 AS (SELECT user_id, i, ${mul64(xor64("h", shr("h", 33)), P2)} AS h FROM s2),
       |a2 AS (SELECT user_id, i, ${mul64(xor64("h", shr("h", 29)), P3)} AS h FROM a1),
       |bk AS (SELECT user_id, i, CAST(${xor64("h", shr("h", 32))} // $w AS BIGINT) AS b FROM a2),
       |cnt AS (SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM bk GROUP BY 1, 2),
       |kb AS (SELECT DISTINCT user_id, i, b FROM bk),
       |est AS (SELECT user_id, MIN(c) AS cms_cnt FROM kb JOIN cnt USING (i, b) GROUP BY 1),
       |ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM ev GROUP BY 1),
       |top AS (SELECT user_id, exact_cnt FROM ex ORDER BY exact_cnt DESC, user_id LIMIT 20)
       |SELECT user_id, exact_cnt, cms_cnt FROM top JOIN est USING (user_id)
       |ORDER BY user_id""".stripMargin
  }

  /** k5's AMS geometry: R=64 sign counters. Counter j sums
    * sign_j(key) ∈ {−1,+1}, the sign bit of the same chained
    * xxhash64(lit(j), key) k4 uses — Spark's signed `>= 0` test is
    * exactly the unsigned `< 2^63` test the oracle applies. */
  private val AmsR = 64

  /** k5's DuckDB oracle: re-derives every AMS sign counter — per
    * counter ONE XXH64 hashLong stage from the embedded constant seed
    * (the k4/t23 HUGEINT technique), sign from the hash's top bit,
    * exact integer counter sums, Σc² and the exact second moment
    * Σn² — then the estimate as one double division of exact
    * integers, so the row hash-matches cross-engine. */
  private lazy val K5AmsOracleSql: String = {
    import SqlHash._
    val modB = BigInt(Mod)
    val seedRows = (0 until AmsR).map { j =>
      val s = BigInt(xxh64Long(j.toLong, 42L)).mod(modB)
      s"($j, CAST(${(s + BigInt(P5) + 8) mod modB} AS HUGEINT))"
    }.mkString(", ")
    s"""WITH ev AS (SELECT user_id FROM events),
       |seeds AS (SELECT * FROM (VALUES $seedRows) s(j, st)),
       |h0 AS (SELECT user_id, j, st,
       |       ((CAST(user_id AS HUGEINT) % $Mod + $Mod) % $Mod) AS u
       |       FROM ev CROSS JOIN seeds),
       |k1 AS (SELECT user_id, j, st, ${mul64(rotl(mul64("u", P2), 31), P1)} AS k FROM h0),
       |s1 AS (SELECT user_id, j, ${xor64("st", "k")} AS h FROM k1),
       |s2 AS (SELECT user_id, j, (${mul64(rotl("h", 27), P1)} + $P4) % $Mod AS h FROM s1),
       |a1 AS (SELECT user_id, j, ${mul64(xor64("h", shr("h", 33)), P2)} AS h FROM s2),
       |a2 AS (SELECT user_id, j, ${mul64(xor64("h", shr("h", 29)), P3)} AS h FROM a1),
       |sg AS (SELECT j, CASE WHEN ${xor64("h", shr("h", 32))} < ${BigInt(1) << 63}
       |                      THEN 1 ELSE -1 END AS sign FROM a2),
       |c AS (SELECT j, CAST(SUM(sign) AS BIGINT) AS c FROM sg GROUP BY 1),
       |sc AS (SELECT CAST(SUM(c * c) AS BIGINT) AS sum_c2 FROM c),
       |ex AS (SELECT CAST(SUM(n * n) AS BIGINT) AS f2_exact FROM
       |       (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY user_id))
       |SELECT f2_exact, sum_c2,
       |       CAST(sum_c2 AS DOUBLE) / $AmsR.0 AS f2_est
       |FROM ex CROSS JOIN sc""".stripMargin
  }

  /** k6's KMV geometry: the sketch of a set is its K smallest hash
    * values — a pure function of the VALUE SET (dedup before hashing),
    * so sketches are layout-independent, mergeable by union+re-top-K,
    * and intersectable (the theta-sketch estimate). Hashes fold to
    * [0, 2⁶³) (unsigned top bit dropped) so signed ordering IS
    * unsigned ordering on both engines. */
  private val KmvK = 256
  private val KmvDomain = 9223372036854775808.0 // 2^63, exact in double

  /** k6's DuckDB oracle: re-derives the hash (one hashLong stage,
    * seed 42 — the single-arg xxhash64), both K-smallest sketches,
    * θ = min(max(skA), max(skB)), the matched count below θ, and the
    * theta-sketch estimate |S|·2⁶³/θ as the identical left-to-right
    * double expression. Exact intersection as audit column. */
  private lazy val K6ThetaOracleSql: String = {
    import SqlHash._
    val modB = BigInt(Mod)
    // single-arg xxhash64 = hashLong(key, seed 42): acc = 42 + P5 + 8
    val st = (BigInt(42) + BigInt(P5) + 8) mod modB
    s"""WITH ks AS (
       |  SELECT event_type AS tag, CAST(ROUND(value * 1000, 0) AS BIGINT) AS k
       |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
       |h0 AS (SELECT tag, ((CAST(k AS HUGEINT) % $Mod + $Mod) % $Mod) AS u,
       |       CAST($st AS HUGEINT) AS st FROM ks),
       |k1 AS (SELECT tag, st, ${mul64(rotl(mul64("u", P2), 31), P1)} AS k FROM h0),
       |s1 AS (SELECT tag, ${xor64("st", "k")} AS h FROM k1),
       |s2 AS (SELECT tag, (${mul64(rotl("h", 27), P1)} + $P4) % $Mod AS h FROM s1),
       |a1 AS (SELECT tag, ${mul64(xor64("h", shr("h", 33)), P2)} AS h FROM s2),
       |a2 AS (SELECT tag, ${mul64(xor64("h", shr("h", 29)), P3)} AS h FROM a1),
       |hh AS (SELECT tag, CAST(${xor64("h", shr("h", 32))} // 2 AS BIGINT) AS h FROM a2),
       |ska AS (SELECT h FROM hh WHERE tag = 'click' ORDER BY h LIMIT $KmvK),
       |skb AS (SELECT h FROM hh WHERE tag = 'purchase' ORDER BY h LIMIT $KmvK),
       |th AS (SELECT CAST(LEAST((SELECT MAX(h) FROM ska),
       |                          (SELECT MAX(h) FROM skb)) AS BIGINT) AS theta),
       |sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s
       |       FROM ska JOIN skb USING (h) CROSS JOIN th WHERE h < theta),
       |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_common FROM
       |       (SELECT DISTINCT CAST(ROUND(value * 1000, 0) AS BIGINT) AS k
       |        FROM events WHERE event_type = 'click') a
       |       JOIN
       |       (SELECT DISTINCT CAST(ROUND(value * 1000, 0) AS BIGINT) AS k
       |        FROM events WHERE event_type = 'purchase') b USING (k))
       |SELECT theta, s,
       |  CAST(s AS DOUBLE) * $KmvDomain / CAST(theta AS DOUBLE) AS est_common,
       |  exact_common
       |FROM th CROSS JOIN sc CROSS JOIN ex""".stripMargin
  }

  /** k7's bottom-k sample geometry: the K rows with the smallest
    * [0, 2⁶³) hashes of event_id form a uniform without-replacement
    * sample that is a pure function of the ID SET — partition-layout
    * independent, mergeable by union + re-bottom-K (the KMV property,
    * applied to ROWS instead of distinct keys), so per-day samples
    * fold into a corpus sample without re-reading history. */
  private val QuantK = 512
  private val QuantGrid = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** k7's DuckDB oracle: re-derives the bottom-K sample (one hashLong
    * stage, seed 42 — the k6 chain verbatim), ranks it by (value,
    * event_id), selects each grid quantile by the EXPLICIT index rule
    * rn = greatest(1, ceil(q·n)) — no reliance on either engine's
    * builtin quantile interpolation — and audits each estimate with
    * the exact full-corpus rank SUM(value ≤ est): estimates are
    * sample ELEMENTS (exact parquet doubles), counts integers, so
    * every column hash-matches cross-engine. */
  private lazy val K7QuantileOracleSql: String = {
    import SqlHash._
    val modB = BigInt(Mod)
    val st = (BigInt(42) + BigInt(P5) + 8) mod modB
    val grid = QuantGrid.mkString("[", ", ", "]")
    s"""WITH ev AS (SELECT event_id, value FROM events),
       |h0 AS (SELECT event_id, value,
       |       ((CAST(event_id AS HUGEINT) % $Mod + $Mod) % $Mod) AS u,
       |       CAST($st AS HUGEINT) AS st FROM ev),
       |k1 AS (SELECT event_id, value, st, ${mul64(rotl(mul64("u", P2), 31), P1)} AS k FROM h0),
       |s1 AS (SELECT event_id, value, ${xor64("st", "k")} AS h FROM k1),
       |s2 AS (SELECT event_id, value, (${mul64(rotl("h", 27), P1)} + $P4) % $Mod AS h FROM s1),
       |a1 AS (SELECT event_id, value, ${mul64(xor64("h", shr("h", 33)), P2)} AS h FROM s2),
       |a2 AS (SELECT event_id, value, ${mul64(xor64("h", shr("h", 29)), P3)} AS h FROM a1),
       |hh AS (SELECT event_id, value,
       |       CAST(${xor64("h", shr("h", 32))} // 2 AS BIGINT) AS h FROM a2),
       |sm AS (SELECT event_id, value FROM hh ORDER BY h, event_id LIMIT $QuantK),
       |rk AS (SELECT value,
       |         ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
       |         COUNT(*) OVER () AS n FROM sm),
       |g AS (SELECT UNNEST(CAST($grid AS DOUBLE[])) AS q),
       |est AS (SELECT q, CAST(n AS BIGINT) AS n_sample, value AS est
       |        FROM g JOIN rk
       |        ON rn = GREATEST(1, CAST(CEIL(q * n) AS BIGINT)))
       |SELECT e.q, e.n_sample, e.est,
       |       CAST(SUM(CASE WHEN ev.value <= e.est THEN 1 ELSE 0 END) AS BIGINT)
       |         AS cnt_le
       |FROM est e CROSS JOIN ev
       |GROUP BY 1, 2, 3 ORDER BY q""".stripMargin
  }

  /** The KMV sketch of a key frame: K smallest [0,2⁶³) hashes of the
    * DISTINCT keys. distinct → map-side-combined aggregate;
    * orderBy+limit → per-partition top-K merged at the driver
    * (TakeOrdered) — K rows of driver traffic however large the set. */
  private[queries] def kmvSketch(keys: org.apache.spark.sql.DataFrame,
      keyCol: String): org.apache.spark.sql.DataFrame =
    keys.select(col(keyCol)).distinct()
      .select(shiftrightunsigned(xxhash64(col(keyCol)), 1).as("h"))
      .orderBy("h").limit(KmvK)

  /** The AMS counter vector over a long key column — R exact integer
    * sums in ONE scan pass (no explode, no row blow-up): each counter
    * is its own codegen'd SUM(±1) expression, partial-aggregated
    * map-side, so the exchange carries R values per task whatever the
    * corpus size. */
  private[queries] def amsCounters(keys: org.apache.spark.sql.DataFrame,
      keyCol: String): org.apache.spark.sql.DataFrame = {
    val sums = (0 until AmsR).map { j =>
      sum(when(xxhash64(lit(j.toLong), col(keyCol)) >= 0, 1L)
        .otherwise(-1L)).as(s"c$j")
    }
    keys.agg(sums.head, sums.tail: _*)
  }

  /** One (i, b) hash-row/bucket struct per count-min row for `key` —
    * explodes to D rows. Pure codegen'd built-ins (xxhash64 +
    * shiftrightunsigned); no UDF anywhere in the sketch path. */
  private def cmsBuckets(key: org.apache.spark.sql.Column) =
    explode(array((0 until CmsD).map(i =>
      struct(lit(i).as("i"),
        shiftrightunsigned(xxhash64(lit(i.toLong), key), 64 - CmsLogW)
          .as("b"))): _*))

  /** The count-min counter GRID over a single long key column — the
    * sketch itself: ≤ D·W cells however large the corpus, so the
    * groupBy partial-aggregates map-side (sketch merge ≡ cell-wise
    * sum) and the exchange carries at most D·W rows per task. */
  private[queries] def cmsGrid(keys: org.apache.spark.sql.DataFrame,
      keyCol: String): org.apache.spark.sql.DataFrame =
    keys.select(cmsBuckets(col(keyCol)).as("ib"))
      .select(col("ib.i").as("i"), col("ib.b").as("b"))
      .groupBy("i", "b").agg(count(lit(1)).as("c"))

  /** Point-query the grid: each row of `queryKeys` gains `cms_cnt` =
    * min of its D counters. The grid is bounded ⇒ broadcast. */
  private[queries] def cmsLookup(queryKeys: org.apache.spark.sql.DataFrame,
      keyCol: String,
      grid: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val carried = queryKeys.columns.map(col).toSeq
    queryKeys.select(carried :+ cmsBuckets(col(keyCol)).as("ib"): _*)
      .select(carried :+ col("ib.i").as("i") :+ col("ib.b").as("b"): _*)
      .join(broadcast(grid), Seq("i", "b"))
      .groupBy(carried: _*)
      .agg(min(col("c")).as("cms_cnt"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("s1_tumbling_window",
      """SELECT TIME_BUCKET(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w, event_type,
        |       COUNT(*) AS c, ROUND(SUM(value),2) AS sv
        |FROM events GROUP BY w, event_type ORDER BY w, event_type""".stripMargin) { (s, d) =>
      // date_trunc ≡ window($"ts","1 hour").start for an epoch-aligned
      // hour tumble, at a fraction of the expression weight (TimeWindow
      // expands to a per-row modular-arithmetic case chain; the
      // streaming form in streaming/StreamingOps keeps the real
      // window() operator where windows can slide or gap).
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
        .orderedRows(col("w"), col("event_type")) // rows scale with time range
    },

    QueryDef("s2_sliding_window",
      """SELECT b AS w_start, event_type, COUNT(*) AS c FROM (
        |  SELECT UNNEST(GENERATE_SERIES(
        |           TIME_BUCKET(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) - INTERVAL 45 MINUTE,
        |           TIME_BUCKET(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)), INTERVAL 15 MINUTE)) AS b,
        |         event_type FROM events) t
        |GROUP BY w_start, event_type ORDER BY w_start, event_type""".stripMargin) { (s, d) =>
      // Sliding window via one floor-div + a 4-literal-offset explode:
      // a row in 15-min bucket b belongs exactly to the 1h windows
      // starting b-45m..b (slide divides width), so the explode emits
      // the same rows as the native window() operator's Expand at a
      // fraction of the per-copy expression weight (TimeWindow
      // computes its modular-arithmetic chain per window instance per
      // row). Same single exchange; the streaming twin (StreamingOps)
      // keeps the real window() operator, which is where sliding
      // windows earn state semantics.
      Tables.events(s, d)
        .select(timestamp_micros(
          expr("unix_micros(ts) div 900000000 * 900000000")).as("b"),
          col("event_type"))
        .select(explode(array(col("b"),
          col("b") - expr("INTERVAL 15 MINUTES"),
          col("b") - expr("INTERVAL 30 MINUTES"),
          col("b") - expr("INTERVAL 45 MINUTES"))).as("w_start"),
          col("event_type"))
        .groupBy("w_start", "event_type")
        .agg(count(lit(1)).as("c"))
        .orderedRows(col("w_start"), col("event_type")) // rows scale with time range
    },

    QueryDef("s3_session_windows",
      """SELECT user_id, COUNT(DISTINCT sid) AS sessions FROM (
        |  SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM (
        |    SELECT user_id, ts, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_s
        |    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e) t1) t2
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      // Gaps-and-islands: a session break is a >30 min silence.
      val byUser = Window.partitionBy("user_id").orderBy("ts")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"))
        .withColumn("prev", lag("ts", 1).over(byUser))
        .withColumn("new_s",
          when(col("prev").isNull ||
            col("ts") > col("prev") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("sid", sum("new_s").over(byUser))
        .groupBy("user_id")
        // sid is a running count of session breaks starting at 1, so
        // #sessions = max(sid) — same value as COUNT(DISTINCT sid)
        // without the distinct expansion inside the aggregate
        .agg(max("sid").as("sessions"))
        .orderedRows(col("user_id")) // one row per user: scales
    },

    QueryDef("s5_dedup",
      """SELECT COUNT(*) AS c FROM (SELECT DISTINCT event_id FROM events) t""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select("event_id").distinct()
        .agg(count(lit(1)).as("c"))
    },

    // s8: time-series gap fill — densify the sparse hourly series so
    // every (hour, event_type) cell exists, zero-filled. Scale shape:
    // the ONLY corpus-sized work is the hourly groupBy (one shuffle,
    // map-side combined), and the corpus is scanned ONCE: the bounds
    // (min/max hour) and the type dimension both derive from the
    // hours×types aggregate, which is `localCheckpoint`ed so its
    // three consumers (spine bounds, type list, fill join) read the
    // materialized partitions instead of each re-running the scan —
    // without it Catalyst plans three column-pruned corpus scans,
    // one per consumer (measured in the formatted plan). The spine
    // is generated DISTRIBUTED via sequence()+explode from a one-row
    // bounds aggregate, never a driver loop; everything downstream
    // operates on spine-sized frames.
    QueryDef("s8_gap_fill",
      """WITH e AS (SELECT TIME_BUCKET(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) h,
        |                  event_type, value FROM events),
        |agg AS (SELECT h, event_type, COUNT(*) c, ROUND(SUM(value),2) sv FROM e GROUP BY 1,2),
        |b AS (SELECT MIN(h) lo, MAX(h) hi FROM e),
        |spine AS (SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) h FROM b),
        |grid AS (SELECT h, event_type FROM spine
        |         CROSS JOIN (SELECT DISTINCT event_type FROM e) ty)
        |SELECT g.h AS h, g.event_type AS event_type,
        |       CAST(COALESCE(a.c, 0) AS BIGINT) AS c,
        |       COALESCE(a.sv, 0.0) AS sv
        |FROM grid g LEFT JOIN agg a ON a.h = g.h AND a.event_type = g.event_type
        |ORDER BY h, event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(date_trunc("hour", col("ts")).as("h"),
          col("event_type"), col("value"))
      val agg = e.groupBy("h", "event_type")
        .agg(count(lit(1)).as("c0"), round(sum("value"), 2).as("sv0"))
        .localCheckpoint() // hours×types — tiny; one corpus scan total
      val spine = agg.agg(min("h").as("lo"), max("h").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("h"))
      val grid = spine.crossJoin(agg.select("event_type").distinct())
      grid.join(agg, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"),
          coalesce(col("c0"), lit(0L)).as("c"),
          coalesce(col("sv0"), lit(0d)).as("sv"))
        .orderedRows(col("h"), col("event_type")) // rows scale with time range
    },

    // s9: cohort retention — the product-analytics staple over an
    // event stream: users bucketed by first-seen week (their cohort),
    // activity counted per (cohort, weeks-since-first) cell. Scale
    // shape: the corpus collapses FIRST to distinct (user, week) —
    // partial distinct runs map-side before the one wide exchange, so
    // the shuffle carries user×active-weeks rows, not events; the
    // first-seen week is then a min-window over that collapsed frame
    // (user-keyed), and the final retention-grid aggregate is
    // cohorts×offsets — tiny. COUNT(*) counts USERS exactly because
    // (user, week) is distinct and each user has one cohort week.
    // Both engines truncate to Monday weeks; the offset division is
    // exact (week deltas are multiples of 7 days).
    // s11: funnel analysis — the other product-analytics staple: how
    // many users progressed signup → view-after-signup → purchase-
    // after-that-view, with strict event ordering (a view only counts
    // if it happens after the user's first signup, a purchase only
    // after the first qualifying view). Scale shape: ONE sort+exchange
    // on user_id serves both stacked window passes (same spec:
    // running-frame conditional mins stream through WindowExec with no
    // buffering), the per-user flag aggregate reuses that exact hash
    // partitioning (no second exchange), and the final funnel counts
    // are a 1-row reduce. Ties broken by event_id so the running mins
    // are a pure function of the data on both engines; stage
    // comparisons are strict (ts >), value-based, order-independent.
    QueryDef("s11_funnel",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |           FROM events),
        |w1 AS (SELECT user_id, event_id, ts, event_type,
        |         MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
        |       FROM e),
        |w2 AS (SELECT *, COALESCE(event_type = 'view' AND ts > rs, FALSE) AS qv FROM w1),
        |w3 AS (SELECT *, MIN(CASE WHEN qv THEN ts END) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rv
        |       FROM w2),
        |w4 AS (SELECT *, COALESCE(event_type = 'purchase' AND ts > rv, FALSE) AS qp FROM w3),
        |u AS (SELECT user_id, MAX(event_type = 'signup') AS s1, MAX(qv) AS s2, MAX(qp) AS s3
        |      FROM w4 GROUP BY user_id)
        |SELECT CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |       CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_view_after,
        |       CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after
        |FROM u""".stripMargin) { (s, d) =>
      funnel(Tables.events(s, d))
    },

    QueryDef("s9_cohort_retention",
      """WITH uw AS (SELECT DISTINCT user_id,
        |              CAST(DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS DATE) AS aw
        |            FROM events),
        |fw AS (SELECT user_id, MIN(aw) AS cw FROM uw GROUP BY 1)
        |SELECT cw AS cohort_week, CAST((aw - cw) // 7 AS INT) AS week_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM uw JOIN fw USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      cohortRetention(Tables.events(s, d))
        .orderedSmall(col("cohort_week"), col("week_offset"))
    },

    // k1: mergeable-sketch distinct counting — the operator that makes
    // "unique users per segment" affordable at 100 TB, where an exact
    // COUNT(DISTINCT) must shuffle every (segment, user) pair.
    // r12 (VERDICT r11 item 4): the sketch is now the engine's own
    // functions.HllAgg — classic HyperLogLog with SplitMix64 hashing,
    // 4096 registers merged by max (commutative/idempotent, so the
    // estimate is a pure function of the value SET — partition-layout
    // independence stays spec-asserted), and an INTEGER-EXACT register
    // sum, which is what makes the estimate fully re-derivable in
    // DuckDB SQL (the d2 technique): the oracle recomputes hash →
    // register index/rank → register-max → the identical estimate
    // expression from the raw rows, and must hash-match. Spark's
    // approx_count_distinct (HLL++) was the r9 form; its empirical
    // bias-interpolation tables are what kept k1 golden-only.
    // The exact count rides along as the audit column.
    QueryDef("k1_sketch_distinct", K1HllOracleSql) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          graft.functions.HllAgg.column(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderedSmall(col("event_type"))
    },

    // k4: count-min FREQUENCY sketch (r12) — k1's frequency twin: the
    // operator that answers "how often does key x occur" over an
    // unbounded key space in bounded memory, where an exact per-key
    // count must shuffle every distinct key. The sketch IS a D×W
    // counter grid (D=4 hash rows × W=256 top-8-bit buckets), built
    // here as a bounded groupBy — cell count ≤ 1024 whatever the
    // corpus does, so partial aggregation map-side is exactly the
    // sketch's cell-wise-sum merge and the exchange carries ≤ D·W rows
    // per task. Estimates are ONE-SIDED (cms ≥ exact always — a
    // bucket's counter includes the key's own rows) with the classic
    // ε = e/W overcount bound; the heaviest 20 keys (exact count desc,
    // audit column) are the queried set, their estimates read from the
    // broadcast grid via the same codegen'd xxhash64 expressions. The
    // whole path is built-in expressions — no UDF, no UDAF.
    QueryDef("k4_countmin_freq", K4CmsOracleSql) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"))
      val grid = cmsGrid(ev, "user_id")
      val top = ev.groupBy("user_id")
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("user_id"))
        .limit(20)
      cmsLookup(top, "user_id", grid)
        .orderedSmall(col("user_id")) // 20 rows by construction
    },

    // k6: KMV/THETA sketch SET INTERSECTION (r12) — the sketch family's
    // set-operation member: estimate the DISTINCT OVERLAP of two key
    // sets from two K-value sketches, never joining the sets
    // themselves. Each sketch is the K smallest hashes of the distinct
    // keys (a pure function of the set — mergeable, layout-free, K rows
    // of driver traffic whatever the corpus); θ = min of the two
    // sketches' K-th smallest, matched hashes below θ scale by 2⁶³/θ —
    // the standard theta-sketch estimator, here over the click- and
    // purchase-side value keys (~1.8k distinct each, 304 common at
    // sf0.01). Everything up to the final division is exact integers,
    // so the oracle re-derives the whole pipeline bit-for-bit; the
    // exact intersection rides along as audit.
    QueryDef("k6_theta_intersect", K6ThetaOracleSql) { (s, d) =>
      val ev = Tables.events(s, d)
      def keys(t: String) = ev.filter(col("event_type") === t)
        .select(round(col("value") * 1000, 0).cast("long").as("k"))
      // each sketch feeds BOTH θ and the match join: materialize the
      // K rows once (the materialize-your-sketch step a real
      // deployment does anyway) and rebuild them as LOCAL relations —
      // ≤K longs of driver traffic by construction, and unlike
      // .cache() nothing stays registered in the block manager after
      // the query returns (cache blocks would otherwise accumulate
      // across bench/test invocations for the JVM lifetime)
      import s.implicits._
      def materialized(df: org.apache.spark.sql.DataFrame) =
        df.as[Long].collect().toSeq.toDF("h")
      val ska = materialized(kmvSketch(keys("click"), "k"))
      val skb = materialized(kmvSketch(keys("purchase"), "k"))
      val th = ska.agg(max("h").as("ta"))
        .crossJoin(skb.agg(max("h").as("tb")))
        .select(least(col("ta"), col("tb")).as("theta"))
      val sc = ska.join(skb, "h").crossJoin(th)
        .where(col("h") < col("theta"))
        .agg(count(lit(1)).as("s"))
      val ex = keys("click").distinct()
        .join(keys("purchase").distinct(), "k")
        .agg(count(lit(1)).as("exact_common"))
      th.crossJoin(sc).crossJoin(ex)
        .select(col("theta"), col("s"),
          (col("s").cast("double") * lit(KmvDomain) /
            col("theta").cast("double")).as("est_common"),
          col("exact_common"))
    },

    // k7: BOTTOM-K SAMPLE QUANTILES (r14) — the fourth sketch family:
    // ORDER STATISTICS. The K smallest-hash rows form a uniform
    // without-replacement sample that is a pure function of the ID set
    // (layout-independent, mergeable by union + re-bottom-K — per-day
    // samples fold into a corpus sample without re-reading history),
    // and quantile estimates are sample ELEMENTS selected by the
    // explicit rank rule rn = max(1, ⌈q·n⌉) — never an engine builtin's
    // interpolation, so both engines pick the identical parquet double.
    // Scale shape: ONE per-partition top-K pass (TakeOrdered — K rows
    // of driver traffic however large the corpus; k6's
    // materialize-your-sketch step rebuilds them as a local relation),
    // then one map-side-combined audit pass counting each estimate's
    // exact full-corpus rank SUM(value ≤ est). |rank/N − q| ~ O(1/√K).
    QueryDef("k7_quantile_bottomk", K7QuantileOracleSql) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select(col("event_id"), col("value"))
      val sampleRows = ev
        .select(col("event_id"), col("value"),
          shiftrightunsigned(xxhash64(col("event_id")), 1).as("h"))
        .orderBy(col("h"), col("event_id")).limit(QuantK)
        .select(col("event_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val n = sampleRows.length.toLong
      // rank the ≤K-row sample at the driver (bounded by construction)
      // with the same (value, id) tie-break the oracle orders by
      val ranked = sampleRows.sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case ((_, v), i) => (i + 1L, v) }.toDF("rn", "value")
      val est = QuantGrid.toDF("q").crossJoin(ranked)
        .where(col("rn") ===
          greatest(lit(1L), ceil(col("q") * lit(n.toDouble)).cast("long")))
        .select(col("q"), lit(n).as("n_sample"), col("value").as("est"))
      ev.crossJoin(broadcast(est))
        .groupBy(col("q"), col("n_sample"), col("est"))
        .agg(sum(when(col("value") <= col("est"), 1L).otherwise(0L))
          .as("cnt_le"))
        .orderedSmall(col("q"))
    },

    // k5: AMS SECOND-MOMENT sketch (r12) — the third sketch family:
    // F2 = Σ_k n_k² (the self-join size, the quantity that prices
    // every equi-join and repetition-skew gate) estimated in R=64
    // counters instead of one counter per distinct key. Each counter
    // sums a ±1 sign per row (the sign bit of the same chained
    // xxhash64 k4 uses); E[c²] = F2 exactly, so Σc²/R estimates F2
    // with σ/F2 ≈ √(2/R) ≈ 18%. The whole sketch is ONE scan pass of
    // R codegen'd SUM(±1) expressions — no explode, no row blow-up,
    // map-side partial aggregation, R values per task on the exchange.
    // Counters are exact integers ⇒ the oracle re-derives them
    // bit-for-bit and the final estimate is one double division of
    // exact integers — hash-stable cross-engine. Exact F2 rides along
    // as the audit column.
    QueryDef("k5_ams_f2", K5AmsOracleSql) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"))
      val sumC2 = amsCounters(ev, "user_id")
        .select((0 until AmsR).map(j => col(s"c$j") * col(s"c$j"))
          .reduce(_ + _).as("sum_c2"))
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")).as("f2_exact"))
      exact.crossJoin(sumC2) // both sides are single rows
        .select(col("f2_exact"), col("sum_c2"),
          (col("sum_c2").cast("double") / AmsR).as("f2_est"))
    },

    // s14: per-key ORDER-DEPENDENT RECURRENCE — the exponential moving
    // average ema_i = 0.2·v_i + 0.8·ema_{i−1} per user over the event
    // stream. A linear recurrence is the one per-key scan no window
    // frame expresses (the closed form Σ 0.2·0.8^(i−j)·v_j needs pow()
    // terms that over/underflow on long series), so this is the
    // documented mapPartitions case: the SECONDARY-SORT pattern —
    // repartition by key, sortWithinPartitions by (key, ts, id), then
    // ONE sequential pass holding O(1) state per partition (current
    // key + running ema), never a per-key row materialization. One
    // exchange + one sort, the exact shape a 100 TB sessionized scan
    // wants. The oracle computes the same recurrence via WITH
    // RECURSIVE; both sides evaluate the identical IEEE expression
    // 0.2·v + 0.8·ema in doubles, so the rounded outputs hash-match.
    // Ties on (ts, event_id) can only be full-row duplicates, which
    // are interchangeable in the recurrence.
    QueryDef("s14_ema_recurrence",
      """WITH RECURSIVE t AS (
        |  SELECT user_id, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, rn, value AS ema FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.user_id, t.event_id, t.rn, 0.2 * t.value + 0.8 * r.ema
        |  FROM t JOIN r ON t.user_id = r.user_id AND t.rn = r.rn + 1)
        |SELECT event_id, user_id, ROUND(ema, 4) AS ema
        |FROM r ORDER BY event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
          col("event_id"), col("value"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "tsu", "event_id")
        .as[(Long, Long, Long, Double)](graft.Enc.longLongLongDouble)
        .mapPartitions { it =>
          var cur = Long.MinValue
          var ema = 0.0
          it.map { case (uid, _, eid, v) =>
            if (uid != cur) { cur = uid; ema = v }
            else ema = 0.2 * v + 0.8 * ema
            (eid, uid, ema)
          }
        }(graft.Enc.longLongDouble)
        .toDF("event_id", "user_id", "ema_raw")
        .select(col("event_id"), col("user_id"),
          round(col("ema_raw"), 4).as("ema"))
        .orderedRows(col("event_id")) // one row per event: scales
    },

    // s15: CUMULATIVE-UNIQUES curve — "total distinct users through
    // hour h", the growth metric a COUNT(DISTINCT) OVER (ORDER BY ts)
    // would need (which neither engine supports over a running frame,
    // and which would hold unbounded state). The exact rewrite: flag
    // each user's FIRST event (row_number over the user partition),
    // bucket to hours, then a running sum of first-flags — distinct
    // counting becomes two bounded exchanges (user-keyed window,
    // hour-keyed aggregate) plus a cumsum over the HOURS frame, which
    // is time-range-bounded, so the unpartitioned final window is a
    // non-issue at any corpus width.
    QueryDef("s15_cumulative_uniques",
      """WITH f AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             ROW_NUMBER() OVER (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |           FROM events),
        |h AS (SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS h,
        |             SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS nu,
        |             COUNT(*) AS n FROM f GROUP BY 1)
        |SELECT h, CAST(nu AS BIGINT) AS new_users, CAST(n AS BIGINT) AS events,
        |       CAST(SUM(nu) OVER (ORDER BY h) AS BIGINT) AS cum_users
        |FROM h ORDER BY h""".stripMargin) { (s, d) =>
      cumulativeUniques(Tables.events(s, d))
        .orderedSmall(col("h")) // one row per hour: time-bounded
    },

    // s16: LOCF forward fill — "last observation carried forward", the
    // time-series repair every feature pipeline needs: at each event,
    // the user's most recent purchase value (or −1 before any). The
    // IGNORE NULLS running last_value is the one-pass form — a single
    // user-keyed sort+exchange, WindowExec streams the frame with O(1)
    // state per row; the join-based alternative (each event to its
    // latest prior purchase) would be an extra as-of join per fill
    // column. Ties on (ts, event_id) can only be full-row duplicates,
    // which carry the same fill value.
    QueryDef("s16_locf",
      """WITH f AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CASE WHEN event_type = 'purchase' THEN value END AS pv
        |           FROM events)
        |SELECT event_id, user_id,
        |       ROUND(COALESCE(LAST_VALUE(pv IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0), 2)
        |         AS last_purchase
        |FROM f ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase", col("value")).as("pv"))
        .withColumn("last_purchase",
          round(coalesce(last("pv", ignoreNulls = true).over(w), lit(-1.0)), 2))
        .select("event_id", "user_id", "last_purchase")
        .orderedRows(col("event_id")) // one row per event: scales
    },

    // s18: INTERVAL SWEEP-LINE concurrency — "how many activity
    // intervals are open at once", the capacity/ops metric (peak
    // concurrent sessions per hour) that no plain aggregate computes:
    // each event opens a 30-min interval, intervals become +1/−1
    // sweep deltas, and the per-hour MAX of the running count is the
    // answer. The scale shape: intervals are CLIPPED at midnight (a
    // piece never crosses a day), so the sweep partitions by DAY —
    // each day's running sum is self-contained, no cross-partition
    // carry (at extreme per-day volume the same clipping recurses to
    // hours with a t16-style carry pass; the partition key is the
    // knob, not the algorithm). End deltas landing exactly on the
    // next midnight are dropped: the day's sweep never reads past its
    // last event, and the new day re-opens crossing pieces itself.
    // Ties at one timestamp order (t, delta) with −1 first — touching
    // half-open intervals never overlap — and within equal (t, delta)
    // groups any order yields the same intermediate-value SET, so the
    // hourly MAX is deterministic on both engines.
    QueryDef("s18_concurrency",
      """WITH iv AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS st,
        |         CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS en
        |  FROM events),
        |p AS (
        |  SELECT st AS ps,
        |         LEAST(en, CAST(CAST(st AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY) AS pe
        |  FROM iv
        |  UNION ALL
        |  SELECT CAST(CAST(st AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY, en
        |  FROM iv
        |  WHERE en > CAST(CAST(st AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY),
        |del AS (
        |  SELECT ps AS t, 1 AS d FROM p
        |  UNION ALL
        |  SELECT pe, -1 FROM p WHERE CAST(pe AS DATE) = CAST(ps AS DATE)),
        |sweep AS (
        |  SELECT t, SUM(d) OVER (PARTITION BY CAST(t AS DATE) ORDER BY t, d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
        |  FROM del)
        |SELECT TIME_BUCKET(INTERVAL 1 HOUR, t) AS h,
        |       CAST(MAX(cur) AS BIGINT) AS peak,
        |       CAST(COUNT(*) AS BIGINT) AS n_changes
        |FROM sweep GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val iv = Tables.events(s, d)
        .select(col("ts").as("st"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
      def dayEnd(c: org.apache.spark.sql.Column) =
        to_date(c).cast("timestamp") + expr("INTERVAL 1 DAY")
      val pieces = iv
        .select(col("st").as("ps"), least(col("en"), dayEnd(col("st"))).as("pe"))
        .union(iv.filter(col("en") > dayEnd(col("st")))
          .select(dayEnd(col("st")).as("ps"), col("en").as("pe")))
      val deltas = pieces.select(col("ps").as("t"), lit(1).as("d"))
        .union(pieces.filter(to_date(col("pe")) === to_date(col("ps")))
          .select(col("pe").as("t"), lit(-1).as("d")))
      val w = Window.partitionBy(to_date(col("t"))).orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("cur", sum("d").over(w).cast("long"))
        .groupBy(date_trunc("hour", col("t")).as("h"))
        .agg(max("cur").as("peak"), count(lit(1)).as("n_changes"))
        .orderedSmall(col("h")) // one row per hour: time-bounded
    }
  )

  /** Hourly new/cumulative distinct-user curve over a (user_id, ts,
    * event_id, …) frame — see the s15 entry above for semantics and
    * the scale shape. */
  def cumulativeUniques(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("new_users"),
        count(lit(1)).as("events"))
      .withColumn("cum_users", sum("new_users").over(
        Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Strict-order funnel counts over a (user_id, event_id, ts,
    * event_type) frame — see the s11 entry above for semantics and the
    * scale shape. Both window passes share one (partition, order) spec;
    * flags coalesce to FALSE so null running-mins (stage never reached)
    * never poison the aggregate. */
  def funnel(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rs", min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("qv",
        coalesce(col("event_type") === "view" && col("ts") > col("rs"), lit(false)))
      .withColumn("rv", min(when(col("qv"), col("ts"))).over(w))
      .withColumn("qp",
        coalesce(col("event_type") === "purchase" && col("ts") > col("rv"), lit(false)))
      .groupBy("user_id")
      .agg(max(col("event_type") === "signup").as("s1"),
        max(col("qv")).as("s2"), max(col("qp")).as("s3"))
      .agg(
        sum(when(col("s1"), 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n_view_after"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n_purchase_after"))
  }

  /** Weekly cohort-retention grid over a (user_id, ts, …) frame —
    * see the s9 entry above for semantics and the scale shape. */
  def cohortRetention(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val uw = events
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("aw"))
      .distinct()
    uw.withColumn("cw", min("aw").over(Window.partitionBy("user_id")))
      .groupBy(col("cw").as("cohort_week"),
        (datediff(col("aw"), col("cw")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
