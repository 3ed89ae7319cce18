package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate over (score, id) pairs — the partial-
  * aggregating alternative to `row_number().over(Window.partitionBy)`
  * for per-group top-k: a window plan shuffles EVERY scored row to its
  * group's reducer before ranking, while this aggregate keeps a k-slot
  * buffer per group on the map side, so the exchange carries at most
  * groups × k × partitions entries no matter how many rows were
  * scored — the difference between shuffling N·Q scored pairs and
  * shuffling Q·k shortlists in a batch ANN serving job (a11).
  *
  * Order: score DESC, id ASC on ties — the `ROW_NUMBER() OVER (ORDER
  * BY s DESC, id)` contract every ANN oracle in this repo ranks by.
  * The buffer is a pair of fixed k-length arrays mutated in place
  * (Spark's typed-Aggregator contract allows mutable buffers; the
  * product encoder serializes them only across the exchange).
  * `finish` returns the sorted (score, id) list, ready to posexplode
  * into (rnk, id, score) rows.
  */
object TopKAgg {

  /** Mutable k-slot buffer: parallel arrays, first `n` slots used. */
  final case class Buf(scores: Array[Double], ids: Array[Long], n: Int)

  final class TopK(k: Int)
      extends Aggregator[(Double, Long), Buf, Seq[(Double, Long)]] {

    override def zero: Buf = Buf(new Array[Double](k), new Array[Long](k), 0)

    /** True when (s1, id1) ranks WORSE than (s2, id2). */
    @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long)
        : Boolean = s1 < s2 || (s1 == s2 && id1 > id2)

    private def insert(b: Buf, s: Double, id: Long): Buf =
      if (b.n < k) {
        b.scores(b.n) = s; b.ids(b.n) = id
        Buf(b.scores, b.ids, b.n + 1)
      } else {
        // replace the current worst slot if the newcomer beats it
        var w = 0
        var i = 1
        while (i < k) {
          if (worse(b.scores(i), b.ids(i), b.scores(w), b.ids(w))) w = i
          i += 1
        }
        if (worse(s, id, b.scores(w), b.ids(w))) b
        else { b.scores(w) = s; b.ids(w) = id; b }
      }

    override def reduce(b: Buf, a: (Double, Long)): Buf =
      insert(b, a._1, a._2)

    override def merge(b1: Buf, b2: Buf): Buf = {
      var b = b1
      var i = 0
      while (i < b2.n) { b = insert(b, b2.scores(i), b2.ids(i)); i += 1 }
      b
    }

    override def finish(b: Buf): Seq[(Double, Long)] =
      (0 until b.n).map(i => (b.scores(i), b.ids(i)))
        .sortBy { case (s, id) => (-s, id) }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** top_k(score, id): ARRAY<STRUCT<_1: score, _2: id>> of the k best. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopK(k)).apply(score, id)
}
