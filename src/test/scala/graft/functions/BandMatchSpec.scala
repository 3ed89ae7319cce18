package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** FirstBandMatch: the banded-LSH in-stream dedupe predicate. The
  * load-bearing property is candidate-set equivalence — summing the
  * predicate over all bands must equal "at least one band matches"
  * exactly once. */
class BandMatchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def firstMatchRef(x: Long, y: Long, bits: Int, n: Int): Int = {
    val xr = x ^ y
    val mask = (1L << bits) - 1
    (0 until n).find(b => ((xr >>> (b * bits)) & mask) == 0L).getOrElse(-1)
  }

  test("matches the reference fold across geometries, incl. codegen path") {
    import spark.implicits._
    FirstBandMatch.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(2000)((rnd.nextLong(), rnd.nextLong())) ++
      // near-identical signatures (the true-pair regime) + edge cases
      (0 until 64).map(i => (-1L, -1L ^ (1L << i))) ++
      Seq((0L, 0L), (-1L, -1L), (Long.MinValue, Long.MaxValue))
    for ((bits, n) <- Seq((2, 32), (3, 20), (16, 4), (1, 64), (4, 16))) {
      val got = rows.toDF("x", "y")
        .select(FirstBandMatch.first_band_match(
          col("x"), col("y"), bits, n).as("m"))
        .collect().map(_.getInt(0)).toSeq
      val want = rows.map { case (x, y) => firstMatchRef(x, y, bits, n) }
      assert(got == want, s"bits=$bits n=$n")
    }
  }

  test("dedupe identity: exactly one band index wins iff any band matches") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 5000) {
      val x = rnd.nextLong(); val y = rnd.nextLong()
      val bits = 2; val n = 32
      val m = firstMatchRef(x, y, bits, n)
      val matching = (0 until n).filter(b =>
        (((x ^ y) >>> (b * bits)) & 3L) == 0L)
      if (matching.isEmpty) assert(m == -1)
      else assert(m == matching.min &&
        matching.count(_ == m) == 1)
    }
  }

  test("geometry must pack into one long") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    intercept[IllegalArgumentException] {
      FirstBandMatch(Literal(1L), Literal(2L), 3, 32) // 96 bits
    }
  }
}
