package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch (r16): build the persisted ANN/LSH/graph index
  * generations and print the parquet file count per table directory —
  * evidence for the bucketed-write file-shredding fix (guide §6).
  * Not part of the driver contract.
  */
object ProbeIdxFiles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.queries.SimilarityOps.ensureAnnIndexBase(spark, d)
    graft.queries.SimilarityOps.foldAnnDelta(spark, d)
    graft.queries.DedupOps.ensureLshIndexBase(spark, d)
    graft.queries.DedupOps.foldLshDelta(spark, d)
    graft.queries.GraphOps.ensureEdgeTable(spark, d)
    def count(root: String): Unit = {
      val r = new java.io.File(root)
      Option(r.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
        .sortBy(_.getName).foreach { t =>
          val n = Option(t.listFiles()).getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet"))
          println(s"PROBE_FILES ${t} -> $n parquet files")
        }
    }
    count(graft.queries.SimilarityOps.annWarehousePath)
    count(graft.queries.DedupOps.lshWarehousePath)
    count(System.getProperty("java.io.tmpdir") +
      s"/graft_graph_index_${ProcessHandle.current().pid()}")
    spark.stop()
  }
}
