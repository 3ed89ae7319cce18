package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash-signature UDAF (SURVEY.md §2.4 declared surface): aggregates
  * a column of shingle strings into an n-hash MinHash signature —
  * `groupBy(doc).agg(minhash(col("shingle")))`. Commutative +
  * associative merge, so Spark runs it partial/final (map-side combine)
  * like any built-in aggregate.
  *
  * Same hash family as HashOps.minhashSig (XXH64 seeded per slot), so
  * the exploded-aggregation path and the per-row array path produce
  * identical signatures — asserted in PipelineOpsSpec.
  */
class MinHashAgg(n: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(n)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var s = 0
    while (s < n) {
      val h = HashOps.hash(shingle, s.toLong)
      if (h < buf(s)) buf(s) = h
      s += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object MinHashAgg {
  /** Column-API aggregate function: minhash(shingleCol). */
  def minhash(n: Int = 32): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinHashAgg(n), Encoders.STRING)
}
