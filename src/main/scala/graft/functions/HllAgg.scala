package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog sketch over 64-bit keys — the k1 operator.
  *
  * Unlike `approx_count_distinct` (Spark's HLL++, whose empirical
  * bias-interpolation tables make the estimate practically
  * inexpressible in an independent engine), this is the CLASSIC
  * Flajolet et al. estimator with every step chosen to be exactly
  * re-derivable in DuckDB SQL (the d2 technique — the k1 oracle
  * recomputes hash, registers and estimate from raw rows and must
  * hash-match):
  *
  *  - hash: SplitMix64 (public-domain finalizer; three xorshift-
  *    multiply rounds — wrapping 64-bit arithmetic ≡ HUGEINT
  *    mod-2^64 limb products in SQL);
  *  - m = 4096 registers (p = 12, rse ≈ 1.04/√m ≈ 1.6%): register
  *    index = top 12 hash bits, rank = leading zeros of the remaining
  *    bits + 1, CAPPED at 41 so the register sum Σ 2^(41−M_j) is an
  *    exact integer ≤ 2^53 on BOTH engines — no float summation
  *    order anywhere (the cap costs nothing: rank 41 ⇒ ~2^-40
  *    probability per key);
  *  - estimate: E = α·m²·2^41 / S as ONE double division of exact
  *    integers, with the standard small-range linear-counting branch
  *    m·ln(m/V) when E ≤ 2.5m and empty registers remain; rounded to
  *    a whole count.
  *
  * Registers merge by element-wise max — commutative, idempotent,
  * associative — so the sketch partial-aggregates map-side and the
  * estimate is a pure function of the value SET (partition-layout
  * independent, asserted in spec).
  */
object HllAgg extends Aggregator[java.lang.Long, Array[Byte], Long] {

  val P = 12
  val M = 1 << P // 4096
  val RankCap = 41

  def hash(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def registerOf(h: Long): (Int, Byte) = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank =
      if (w == 0) RankCap
      else math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, RankCap)
    (idx, rank.toByte)
  }

  /** Estimate from registers — the EXACT expression the DuckDB oracle
    * re-evaluates: identical literals, identical association order,
    * one double division of exact integers. */
  def estimate(regs: Array[Byte]): Long = {
    var s = 0L
    var v = 0L
    var i = 0
    while (i < M) {
      s += 1L << (RankCap - regs(i))
      if (regs(i) == 0) v += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / 4096.0)
    val e = alpha * 4096.0 * 4096.0 * 2199023255552.0 / s.toDouble
    val est = if (v > 0 && e <= 10240.0) 4096.0 * math.log(4096.0 / v) else e
    math.round(est)
  }

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(b: Array[Byte], a: java.lang.Long): Array[Byte] = {
    if (a != null) {
      val (idx, r) = registerOf(hash(a))
      if (r > b(idx)) b(idx) = r
    }
    b
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(regs: Array[Byte]): Long = estimate(regs)

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Column form for untyped groupBy.agg. */
  def column(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this, Encoders.LONG).apply(c)
}
