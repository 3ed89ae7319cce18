package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sorted merge-walk verify kernels (l2/d1): value parity with the
  * generic array_intersect form, the PPJoin positional filter, and
  * eval/codegen agreement (both the whole-stage-codegen path used in
  * plans and interpreted eval via a sql() round-trip).
  */
class SortedIntersectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Array[Long], Array[Long], Long)]): Seq[(Int, Int)] = {
    import spark.implicits._
    SortedIntersectSize.register(spark)
    SortedIntersectSizeIfFirst.register(spark)
    rows.toDF("a", "b", "p")
      .select(
        SortedIntersectSize.sorted_intersect_size(col("a"), col("b")).as("n"),
        SortedIntersectSizeIfFirst
          .sorted_intersect_size_if_first(col("a"), col("b"), col("p")).as("nf"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1)))
  }

  test("hand cases: overlap, disjoint, empty, positional accept/reject") {
    val got = run(Seq(
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L, 10L), 3L), // first common = 3
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L, 10L), 5L), // 5 common but not first
      (Array(1L, 2L), Array(3L, 4L), 7L),                  // disjoint
      (Array.empty[Long], Array(1L, 2L), 1L),              // empty side
      (Array(42L), Array(42L), 42L)))                      // single shared
    assert(got == Seq((2, 2), (2, -1), (0, -1), (0, -1), (1, 1)))
  }

  test("randomized parity with set intersection + min-common positional rule") {
    val rnd = new scala.util.Random(20260812L)
    def arr(): Array[Long] =
      Array.fill(rnd.nextInt(40))(rnd.nextLong() % 50).distinct.sorted
    val cases = Seq.fill(60)((arr(), arr()))
    val rows = cases.map { case (a, b) =>
      val common = a.toSet.intersect(b.toSet)
      (a, b, if (common.nonEmpty) common.min else 0L)
    }
    val got = run(rows)
    cases.zip(got).foreach { case ((a, b), (n, nf)) =>
      val common = a.toSet.intersect(b.toSet)
      assert(n == common.size)
      assert(nf == (if (common.nonEmpty) common.size else -1))
    }
    // any non-minimal common hash is rejected by the positional rule
    val multi = cases.filter { case (a, b) => a.toSet.intersect(b.toSet).size >= 2 }
    val rejRows = multi.map { case (a, b) => (a, b, a.toSet.intersect(b.toSet).max) }
    run(rejRows).foreach { case (_, nf) => assert(nf == -1) }
  }

  test("SQL registration evaluates the same kernels") {
    import spark.implicits._
    SortedIntersectSize.register(spark)
    SortedIntersectSizeIfFirst.register(spark)
    Seq((Array(1L, 3L, 5L), Array(3L, 5L, 7L), 3L)).toDF("a", "b", "p")
      .createOrReplaceTempView("si_t")
    val r = spark.sql(
      """SELECT sorted_intersect_size(a, b) n,
        |       sorted_intersect_size_if_first(a, b, p) nf FROM si_t""".stripMargin)
      .collect()(0)
    assert((r.getInt(0), r.getInt(1)) == ((2, 2)))
  }
}
