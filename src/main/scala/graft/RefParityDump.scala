package graft

import org.apache.spark.sql.SparkSession

/** Dev main for tools/ref_parity.py: run the CDC pipeline in
  * bug-compatible mode over a binlog file and dump the generated SQL
  * (comment + statement per event, like the reference's stdout) to a
  * text file. Usage: runMain graft.RefParityDump <binlog> <out> [--flashback]
  */
object RefParityDump {
  def main(args: Array[String]): Unit = {
    val binlog = args(0)
    val out = args(1)
    val flashback = args.contains("--flashback")
    val includeDdl = args.contains("--include-ddl")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = cdc.CdcJob.run(spark, binlog, cdc.Catalog.fixture(spark),
      cdc.CdcConfig(flashback = flashback, bugCompatible = true,
        includeDdl = includeDdl))
    val text = df.select("sql").collect().map(_.getString(0)).mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), text + "\n")
    spark.stop()
  }
}
