package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_TINY=on: validate the full oracle gate under the
    // bench session's TinyExchangeElimination path (AQE must be off for
    // the rule to apply). Default remains the untouched AQE-on session.
    val tiny = sys.env.get("SPARK_GRAFT_TINY").contains("on")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.tinyExchange.enabled", tiny.toString)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", (!tiny).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-iteration subset (driver leaves this unset → full dump)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Golden hashes for deterministic non-SQL-expressible outputs
    // (GoldenHashes doc): recomputed from the parquet just written, so
    // the artifact records exactly what the driver's compare sees.
    val goldens = GoldenHashes.expected.toSeq.sortBy(_._1).flatMap {
      case (name, exp) =>
        if (only.exists(f => !f(name))) None
        else try {
          val actual = GoldenHashes.hashOf(spark.read.parquet(s"$outDir/$name"))
          Some(s"${q(name)}: {${q("expected")}: ${q(exp)}, ${q("actual")}: ${q(actual)}, ${q("match")}: ${actual == exp}}")
        } catch { case e: Throwable =>
          Some(s"${q(name)}: {${q("expected")}: ${q(exp)}, ${q("error")}: ${q(String.valueOf(e.getMessage))}}")
        }
    }
    Files.writeString(Paths.get(s"$outDir/golden_hashes.json"),
      goldens.mkString("{", ",", "}"))
    spark.stop()
  }
}
