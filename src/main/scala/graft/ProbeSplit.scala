package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-split diagnosis for the sf1 pairing (VERDICT r13 item 1):
  * under the EXACT bench-session file configs, print, for each
  * binding-relevant table at a corpus dir, the number of file-scan
  * partitions Spark plans (FilePartition packing of the dir's files)
  * next to the dir's bytes and file count — the parallelism DuckDB's
  * morsel scheduler gets for free. A table whose scan plans ≪ cores
  * partitions starves local[32] regardless of plan quality; this
  * probe locates which tables (if any) do, before any corpus or conf
  * change is made on a guess.
  */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("orders", "lineitem", "customer", "part",
      "documents", "events", "embeddings")
    for (d <- dirs; t <- tables) {
      val path = s"$d/$t.parquet"
      if (new java.io.File(path).isDirectory) {
        val df = spark.read.parquet(path)
        val scan = df.queryExecution.executedPlan.collectFirst {
          case s: FileSourceScanExec => s
        }
        val nPart = scan.map(_.inputRDD.getNumPartitions).getOrElse(-1)
        val files = new java.io.File(path).listFiles()
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        val mb = files.map(_.length()).sum / 1e6
        println(f"$d%-22s $t%-12s files=${files.length}%3d  ${mb}%8.1f MB  scanParts=$nPart%3d")
      }
    }
    spark.stop()
  }
}
