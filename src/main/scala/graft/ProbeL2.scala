package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Dev scratch: l2 structural variants at sf0.1. */
object ProbeL2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import spark.implicits._

    def t(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"  $name: ${ts.map(_._1).min}%.3f s (rows=${ts.head._2})")
    }

    Tables.documents(spark, d).count() // warm

    def setsDf: DataFrame = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, graft.functions.HashOps.shingleHashes(text, 3)) }
      .toDF("doc_id", "sh")
      .filter(size(col("sh")) >= 1)
      .withColumn("c", size(col("sh")))

    def run(sets: DataFrame, selfHint: String): Long = {
      val pref0 = sets.select(col("doc_id"), col("c"),
        explode(expr("slice(sh, 1, size(sh) - ((4 * size(sh) + 4) div 5) + 1)")).as("p"))
      val pref = if (selfHint.isEmpty) pref0 else pref0.hint(selfHint)
      val cand = pref.select(col("doc_id").as("ia"), col("c").as("ca"), col("p"))
        .join(pref.select(col("doc_id").as("ib"), col("c").as("cb"), col("p")), Seq("p"))
        .filter(col("ia") < col("ib") &&
          expr("least(ca, cb) >= (4 * greatest(ca, cb) + 4) div 5"))
        .select("ia", "ib").distinct()
      cand
        .join(sets.select(col("doc_id").as("ia"), col("sh").as("sa")), Seq("ia"))
        .join(sets.select(col("doc_id").as("ib"), col("sh").as("sb")), Seq("ib"))
        .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jac", col("i") * lit(1.0) /
          (size(col("sa")) + size(col("sb")) - col("i")))
        .filter(col("jac") >= 0.8)
        .select(col("ia"), col("ib"), round(col("jac"), 4).as("j"))
        .orderBy("ia", "ib")
        .count()
    }

    t("v1 as-is")(run(setsDf, ""))
    t("v2 cached")({ val sv = setsDf.cache(); val n = run(sv, ""); n })
    t("v3 shuffle_hash self")(run(setsDf, "shuffle_hash"))
    t("v4 cached+shuffle_hash")({ val sv = setsDf.cache(); run(sv, "shuffle_hash") })
    // v5: sets-once via carrying arrays into prefix? measure sets alone
    t("sets alone")(setsDf.count())
    t("sets collect to arrays")(setsDf.agg(sum("c")).count())
    spark.stop()
  }
}
