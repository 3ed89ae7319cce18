package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The GoldenHashes registry asserted in-build: each pinned query's
  * canonical sha256 at sf0.01 must match the recorded value (the same
  * equality Verify emits to golden_hashes.json for the round
  * artifact). A kernel change that shifts any sketch output fails
  * HERE, not silently in a `no_oracle` driver entry.
  */
class GoldenHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  for ((name, exp) <- GoldenHashes.expected.toSeq.sortBy(_._1))
    test(s"$name canonical hash is pinned at sf0.01") {
      val actual = GoldenHashes.hashOf(SparkEntry.queries(name)(spark, sf))
      assert(actual == exp,
        s"$name drifted: recompute deliberately and re-pin GoldenHashes")
    }
}
