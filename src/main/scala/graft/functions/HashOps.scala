package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Primitive-loop hashing kernels for the sketch operators. Catalyst
  * higher-order functions interpret their lambda bodies per element —
  * fine for one lambda per row, ~50× too slow for the O(tokens × bits)
  * inner loops of MinHash/SimHash/hyperplane signatures. These run the
  * same math in JIT'd loops inside typed maps. XXH64 is Spark's own
  * xxhash64 implementation, so determinism matches the SQL surface.
  */
object HashOps {

  def hash(s: String, seed: Long): Long = {
    val b = s.getBytes(UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  /** Sorted distinct 64-bit hashes of the k-token shingles of
    * whitespace-split `text` (empty if fewer than k tokens). The sort
    * makes hash order the global token order that prefix-filtered
    * set-similarity joins need; the hash matches SQL
    * `xxhash64(concat_ws(' ', ...))` (seed 42) so the typed-map and
    * Catalyst forms are interchangeable.
    */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val toks = text.split(' ')
    val n = toks.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hs(i) = hash(sb.toString, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place (sorted)
    var w = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(i - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == n) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** Prefix length of a sorted set of size c for Jaccard τ = 0.8:
    * c − ⌈0.8c⌉ + 1, in integer arithmetic. */
  def prefixLen08(c: Int): Int = c - (4 * c + 4) / 5 + 1

  /** MinHash signature: sig(s) = min over shingles of xxh64(shingle, s). */
  def minhashSig(shingles: Array[String], n: Int): Array[Long] = {
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val b = shingles(i).getBytes(UTF_8)
      var s = 0
      while (s < n) {
        val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, s.toLong)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash signature over pre-hashed (64-bit) shingles:
    * sig(s) = min over shingles of xxh64(shingleHash, s). Same LSH
    * collision behavior as the string form, one string-hash per
    * shingle instead of one per (shingle, seed). */
  def minhashSigFromHashes(shingles: Array[Long], n: Int): Array[Long] = {
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val sh = shingles(i)
      var s = 0
      while (s < n) {
        val h = XXH64.hashLong(sh, s.toLong)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band hashes over a MinHash signature. */
  def bandHashes(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9747b28cL
      var r = 0
      while (r < rowsPerBand) { h = XXH64.hashLong(sig(b * rowsPerBand + r), h); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** 64-bit SimHash over unweighted tokens (majority vote per bit). */
  def simhash64(tokens: Array[String]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = hash(tokens(i), 0L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (counts(k) >= 0) out |= (1L << k); k += 1 }
    out
  }

  /** Per-doc term counts of space-split `text` (Spark `split(text,' ')`
    * semantics: regex split with limit -1, trailing empties kept).
    * One (term, count) pair per DISTINCT term — emitting doc-grain
    * partials lets TF sum them and DF count them from the same stream,
    * so the raw token stream never shuffles. */
  def termCounts(text: String): Iterator[(String, Int)] = {
    val m = new java.util.LinkedHashMap[String, Int]()
    val n = text.length
    var start = 0
    while (start <= n) {
      var e = text.indexOf(' ', start)
      if (e < 0) e = n
      m.merge(text.substring(start, e), 1, Integer.sum(_, _))
      start = e + 1
    }
    import scala.jdk.CollectionConverters._
    m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.intValue()))
  }

  /** Hyperplane components for (nBits, dim), pseudo-random in
    * [-0.5, 0.5) from xxh64(p*4099+i, 13) — precomputed ONCE per JVM:
    * the matrix is static, and recomputing 2 048 hashes per row was
    * ~10× the cost of the dot products they feed (VERDICT r3 #6). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  private def planes(nBits: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((nBits, dim), { case (b, d) =>
      val m = new Array[Double](b * d)
      var p = 0
      while (p < b) {
        var i = 0
        while (i < d) {
          val h = XXH64.hashLong(p.toLong * 4099L + i, 13L)
          m(p * d + i) = ((h % 1000L) + 1000L) % 1000L / 1000.0 - 0.5
          i += 1
        }
        p += 1
      }
      m
    })

  /** Random-hyperplane signature: bit p = sign of <v, plane_p>; plane
    * values identical to the original per-hash form (specs and goldens
    * unchanged), but read from the per-JVM static matrix. */
  def hyperplaneSig(v: Array[Double], nBits: Int): Long = {
    val m = planes(nBits, v.length)
    var sig = 0L
    var p = 0
    while (p < nBits) {
      var s = 0.0
      val off = p * v.length
      var i = 0
      while (i < v.length) { s += v(i) * m(off + i); i += 1 }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Char trigrams of a string (distinct). */
  def trigrams(text: String): Array[String] = {
    if (text.length < 3) return Array.empty
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 3 <= text.length) { set.add(text.substring(i, i + 3)); i += 1 }
    set.toArray(new Array[String](set.size))
  }

  /** Distinct char trigrams PACKED into longs — (c0<<32)|(c1<<16)|c2,
    * injective for BMP chars, so equality and (signed) ordering match
    * the string trigrams' code-unit semantics with zero allocation in
    * the O(chars) hot loop. Sorted ascending (= lexicographic for the
    * ASCII corpus), deduped in place like shingleHashes. */
  def trigramHashes(text: String): Array[Long] = {
    val n = text.length - 2
    if (n <= 0) return Array.emptyLongArray
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = (text.charAt(i).toLong << 32) |
        (text.charAt(i + 1).toLong << 16) | text.charAt(i + 2).toLong
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(i - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == n) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** Rolling-fingerprint constants, shared with the t4 DuckDB oracle
    * (TextAnalysis.FingerprintOracleSql re-derives the identical math
    * with HUGEINT multiply-adds mod 2^64). TokB is the per-token byte
    * polynomial base; WinB combines token hashes into a window hash
    * and chains the sketch into the doc fingerprint; Fp0 seeds the
    * chain. Java `long` arithmetic wraps mod 2^64, which is exactly
    * the oracle's `% 18446744073709551616`. */
  final val FpTokB = 31L
  final val FpWinB = 1000003L
  final val Fp0 = 0x9747b28cL
  private final val FpWinB3 = FpWinB * FpWinB * FpWinB // mod 2^64

  /** Per-token polynomial hash: h = fold(h*31 + byte) over UTF-8. */
  def tokenPolyHash(tok: String): Long = {
    val b = tok.getBytes(UTF_8)
    var h = 0L
    var i = 0
    while (i < b.length) { h = h * FpTokB + (b(i) & 0xff); i += 1 }
    h
  }

  /** Sorted distinct ROLLING window hashes of the k-token shingles:
    * token hashes combine as w = ((t0*B + t1)*B + t2)*B + t3 (k = 4
    * shown), and each slide is O(1) — w' = (w − t_out·B^(k−1))·B +
    * t_in — the Karp–Rabin update, so a w-token document costs
    * O(w·bytes-per-token) regardless of k. Sorted+deduped like
    * [[shingleHashes]] so min-k sketches are prefixes. */
  def rollingShingleHashes(text: String, k: Int): Array[Long] = {
    require(k == 4, "rolling fingerprint is pinned at k=4 (oracle parity)")
    val toks = text.split(" ", -1) // STRING_SPLIT semantics: keep trailing empties
    val n = toks.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = tokenPolyHash(toks(i)); i += 1 }
    val hs = new Array[Long](n)
    var w = ((th(0) * FpWinB + th(1)) * FpWinB + th(2)) * FpWinB + th(3)
    hs(0) = w
    i = 1
    while (i < n) {
      w = (w - th(i - 1) * FpWinB3) * FpWinB + th(i + k - 1)
      hs(i) = w
      i += 1
    }
    java.util.Arrays.sort(hs)
    var ww = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(i - 1)) { hs(ww) = hs(i); ww += 1 }
      i += 1
    }
    if (ww == n) hs else java.util.Arrays.copyOf(hs, ww)
  }

  /** Direct (non-rolling) recompute of the same window hashes, for the
    * rolling-update equivalence spec only. */
  def directShingleHashes(text: String, k: Int): Array[Long] = {
    val toks = text.split(" ", -1) // STRING_SPLIT semantics: keep trailing empties
    val n = toks.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var w = tokenPolyHash(toks(i))
      var j = 1
      while (j < k) { w = w * FpWinB + tokenPolyHash(toks(i + j)); j += 1 }
      hs(i) = w
      i += 1
    }
    java.util.Arrays.sort(hs)
    var ww = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(i - 1)) { hs(ww) = hs(i); ww += 1 }
      i += 1
    }
    if (ww == n) hs else java.util.Arrays.copyOf(hs, ww)
  }

  /** Doc fingerprint: chain the (ascending, signed) min-8 sketch
    * values through fp = fp·B + v starting from Fp0. */
  def chainFingerprint(sketch: Array[Long]): Long = {
    var fp = Fp0
    var i = 0
    while (i < sketch.length) { fp = fp * FpWinB + sketch(i); i += 1 }
    fp
  }

  /** Content-defined chunking (l7): boundary AFTER byte p (1-based)
    * whenever the poly-31 hash of the last CdcWin bytes has its low 6
    * bits zero (expected chunk ≈ 64 B) — the LBFS/Rabin rule in its
    * UNCONSTRAINED form (no min/max clamps: the boundary predicate is
    * then a pure per-position function, which is what lets DuckDB
    * re-derive every boundary; production chunkers add clamps, which
    * only reset state at cuts). The window hash rolls in O(1)
    * (subtract the outgoing byte's 31^16 term); each chunk's content
    * hash is poly-31 over its bytes, all mod 2^64. */
  final val CdcWin = 16
  private final val CdcOutB: Long = {
    var p = 1L; var i = 0
    while (i < CdcWin) { p *= FpTokB; i += 1 }
    p // 31^16 mod 2^64
  }

  /** (start, len, contentHash) per chunk of `text`'s UTF-8 bytes. */
  def contentChunks(text: String): Array[(Int, Int, Long)] = {
    val b = text.getBytes(UTF_8)
    val n = b.length
    if (n == 0) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var wh = 0L
    var ch = 0L
    var start = 0
    var i = 0
    while (i < n) {
      val v = (b(i) & 0xff).toLong
      wh = wh * FpTokB + v
      if (i >= CdcWin) wh -= (b(i - CdcWin) & 0xff).toLong * CdcOutB
      ch = ch * FpTokB + v
      val boundary = (i + 1 >= CdcWin) && (wh & 63L) == 0L
      if (boundary || i == n - 1) {
        out += ((start, i - start + 1, ch))
        start = i + 1
        ch = 0L
      }
      i += 1
    }
    out.toArray
  }
}
