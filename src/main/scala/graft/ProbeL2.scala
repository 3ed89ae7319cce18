package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratch: break l2/l5 into sub-plans and time each at sf0.1. */
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

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
    }

    // warm the JVM + parquet
    Tables.documents(spark, d).count()

    val sets = Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        "array_sort(array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> xxhash64(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))))")
        .as("sh"))
      .withColumn("c", size(col("sh")))

    t("sets (no cache)")(sets.count())
    t("sets again")(sets.count())
    val cached = sets.cache()
    t("sets cache materialize")(cached.count())
    val pref = cached.select(col("doc_id"), col("c"),
      explode(expr("slice(sh, 1, size(sh) - ((4 * size(sh) + 4) div 5) + 1)")).as("p"))
    t("pref explode")(pref.count())
    val cand = pref.select(col("doc_id").as("ia"), col("c").as("ca"), col("p"))
      .join(pref.select(col("doc_id").as("ib"), col("c").as("cb"), col("p")), Seq("p"))
      .filter(col("ia") < col("ib") &&
        expr("least(ca, cb) >= (4 * greatest(ca, cb) + 4) div 5"))
      .select("ia", "ib").distinct()
    t("cand join+distinct")(cand.count())
    val verified = cand
      .join(cached.select(col("doc_id").as("ia"), col("sh").as("sa")), Seq("ia"))
      .join(cached.select(col("doc_id").as("ib"), col("sh").as("sb")), Seq("ib"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("i") * lit(1.0) /
        (size(col("sa")) + size(col("sb")) - col("i")))
      .filter(col("jac") >= 0.8)
      .select(col("ia"), col("ib"), round(col("jac"), 4).as("j"))
    t("verify")(verified.count())
    t("verify+orderBy")(verified.orderBy("ia", "ib").count())
    spark.catalog.clearCache()
    t("l2 full cold")(SparkEntry.queries("l2_jaccard_pairs")(spark, d).count())
    spark.catalog.clearCache()
    t("l2 full cold 2")(SparkEntry.queries("l2_jaccard_pairs")(spark, d).count())

    println("--- l5 ---")
    val tok = Tables.documents(spark, d).select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("term"))
    t("tok explode")(tok.count())
    val byDoc = tok.groupBy("term", "doc_id", "source").agg(count(lit(1)).as("cnt"))
    t("byDoc agg")(byDoc.count())
    spark.catalog.clearCache()
    t("l5 full cold")(SparkEntry.queries("l5_tfidf_top3")(spark, d).count())
    spark.catalog.clearCache()

    println("--- q04 ---")
    t("q04 cold")(SparkEntry.queries("q04_multi_join")(spark, d).count())
    t("q04 warm")(SparkEntry.queries("q04_multi_join")(spark, d).count())
    SparkEntry.queries("q04_multi_join")(spark, d).explain("formatted")
    spark.stop()
  }
}
