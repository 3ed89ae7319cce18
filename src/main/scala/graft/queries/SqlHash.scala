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
}
