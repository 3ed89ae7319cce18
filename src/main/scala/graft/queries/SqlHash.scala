package graft.queries

/** Shared DuckDB-SQL builders for 64-bit wrapping arithmetic — the d2
  * technique (HUGEINT with an explicit mod-2^64; 32-bit-limb schoolbook
  * products because UBIGINT multiply errors on overflow; rotates as
  * divide/multiply by powers of two; XOR through UBIGINT). Used by the
  * oracles that re-derive engine hashes from raw rows (k1's SplitMix64,
  * t23's XXH64-of-long); DedupOps keeps its original private copies for
  * the d2 oracle itself. Expressions COMPOSE textually — chain CTE
  * stages rather than nesting deeply (each mul64 triples its argument
  * text; an 8-stage hash nested inline explodes to ~100 KB of SQL).
  */
private[queries] object SqlHash {
  val Mod = "18446744073709551616"

  def mul64(a: String, b: String): String =
    s"((($a)%4294967296)*(($b)%4294967296)" +
      s" + ((((($a)//4294967296)%4294967296)*(($b)%4294967296)" +
      s" + (($a)%4294967296)*(((($b)//4294967296)%4294967296))) % 4294967296)" +
      s" * 4294967296) % $Mod"

  def rotl(x: String, r: Int): String =
    s"(((($x) % ${BigInt(1) << (64 - r)}) * ${BigInt(1) << r}) + (($x) // ${BigInt(1) << (64 - r)}))"

  def xor64(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  def shr(x: String, n: Int): String = s"(($x) // ${BigInt(1) << n})"

  /** xxHash64 primes (public algorithm constants). */
  val P1 = "11400714785074694791"
  val P2 = "14029467366897019727"
  val P3 = "1609587929392839161"
  val P4 = "9650029242287828579"
  val P5 = "2870177450012600261"

  /** CTE chain re-deriving xxHash64 of a STRING column `tok` (≤ 15
    * UTF-8 bytes — longer raises error(), the d2 loud-fail rule) for an
    * arbitrary seed: the d2 oracle's fully-unrolled sub-16 finalization
    * (one 8-byte chunk, 4-byte lane, ≤3 tail bytes, avalanche),
    * parameterized so other oracles can match Spark's builtin
    * `xxhash64(stringcol)` (seed 42) as well as HashOps.hash (seed 0).
    * Emits stages `<p>th … <p>h`; the final CTE `<p>h` carries
    * `carry` plus `h` (UBIGINT). Every length 1..15 at seeds 0 and 42
    * is validated against Spark's own xxhash64 by
    * `tools/check_xxh64_sql.py`. `src` must expose `carry` and `tok`. */
  def xxh64StrCtes(seed: Long, carry: Seq[String], src: String,
      p: String): String = {
    val cs = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val h0c = (BigInt(seed) + BigInt(P5)).mod(BigInt(Mod)) // + n added per row
    val bytes = (1 to 15).map { q =>
      s"CASE WHEN n >= $q THEN CAST(16*(strpos('0123456789ABCDEF', substr(hx,${2 * q - 1},1))-1)" +
        s" + strpos('0123456789ABCDEF', substr(hx,${2 * q},1))-1 AS HUGEINT)" +
        s" ELSE CAST(0 AS HUGEINT) END AS b$q"
    }.mkString(",\n    ")
    val u64 = "(b1 + b2*256 + b3*65536 + b4*16777216 + b5*4294967296" +
      " + b6*1099511627776 + b7*281474976710656 + b8*72057594037927936)"
    s"""${p}th AS (
       |  SELECT $cs hex(encode(tok)) AS hx,
       |         CAST(octet_length(encode(tok)) AS BIGINT) AS n FROM $src),
       |${p}tb AS (
       |  SELECT $cs n,
       |    $bytes
       |  FROM ${p}th),
       |${p}s0 AS (SELECT $cs n, $u64 AS u64,
       |        (b1 + b2*256 + b3*65536 + b4*16777216) AS u32a,
       |        (b9 + b10*256 + b11*65536 + b12*16777216) AS u32b,
       |        b1, b2, b3, b5, b6, b7, b9, b10, b11, b13, b14, b15,
       |        (CAST($h0c AS HUGEINT) + n) % $Mod AS h0 FROM ${p}tb),
       |${p}s1 AS (SELECT *, CASE WHEN n >= 8 THEN
       |          (${mul64(rotl(xor64("h0", mul64(rotl(mul64("u64", P2), 31), P1)), 27), P1)} + $P4) % $Mod
       |        WHEN n >= 4 THEN
       |          (${mul64(rotl(xor64("h0", mul64("u32a", P1)), 23), P2)} + $P3) % $Mod
       |        ELSE h0 END AS h1a FROM ${p}s0),
       |${p}s1b AS (SELECT *, CASE WHEN n >= 12 THEN
       |          (${mul64(rotl(xor64("h1a", mul64("u32b", P1)), 23), P2)} + $P3) % $Mod
       |        ELSE h1a END AS h1,
       |        CASE WHEN n >= 12 THEN n - 12 WHEN n >= 8 THEN n - 8
       |             WHEN n >= 4 THEN n - 4 ELSE n END AS tl,
       |        CASE WHEN n >= 12 THEN b13 WHEN n > 8 THEN b9
       |             WHEN n >= 4 AND n < 8 THEN b5 ELSE b1 END AS ta,
       |        CASE WHEN n >= 12 THEN b14 WHEN n > 8 THEN b10
       |             WHEN n >= 4 AND n < 8 THEN b6 ELSE b2 END AS tbb,
       |        CASE WHEN n >= 12 THEN b15 WHEN n > 8 THEN b11
       |             WHEN n >= 4 AND n < 8 THEN b7 ELSE b3 END AS tc
       |       FROM ${p}s1),
       |${p}s2 AS (SELECT *, CASE WHEN tl > 0 THEN ${mul64(rotl(xor64("h1", mul64("ta", P5)), 11), P1)} ELSE h1 END AS h2 FROM ${p}s1b),
       |${p}s3 AS (SELECT *, CASE WHEN tl > 1 THEN ${mul64(rotl(xor64("h2", mul64("tbb", P5)), 11), P1)} ELSE h2 END AS h3 FROM ${p}s2),
       |${p}s4 AS (SELECT *, CASE WHEN tl > 2 THEN ${mul64(rotl(xor64("h3", mul64("tc", P5)), 11), P1)} ELSE h3 END AS h4 FROM ${p}s3),
       |${p}a1 AS (SELECT $cs n, ${mul64(xor64("h4", shr("h4", 33)), P2)} AS g1 FROM ${p}s4),
       |${p}a2 AS (SELECT $cs n, ${mul64(xor64("g1", shr("g1", 29)), P3)} AS g2 FROM ${p}a1),
       |${p}h AS (SELECT $cs CASE WHEN n <= 15
       |           THEN xor(CAST((g2) AS UBIGINT), CAST((g2) // 4294967296 AS UBIGINT))
       |           ELSE CAST(error('xxh64 oracle: token > 15 bytes needs a second 8-byte chunk') AS UBIGINT)
       |           END AS h FROM ${p}a2)""".stripMargin
  }
}
