package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ProbeL2c {
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
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"  $name: ${ts.map(_._1).min}%.3f s (rows=${ts.head._2})")
    }
    Tables.documents(spark, d).count()
    import graft.functions.HashOps
    def setsDf: DataFrame = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, HashOps.shingleHashes(text, 3)) }
      .toDF("doc_id", "sh")
      .filter(size(col("sh")) >= 1)
    def prefDf: DataFrame = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sh = HashOps.shingleHashes(text, 3)
        val pl = HashOps.prefixLen08(sh.length)
        Iterator.tabulate(math.min(pl, sh.length))(i => (id, sh.length, sh(i)))
      }.toDF("doc_id", "c", "p")
    def candRaw: DataFrame = {
      val pref = prefDf
      pref.select(col("doc_id").as("ia"), col("c").as("ca"), col("p"))
        .join(pref.select(col("doc_id").as("ib"), col("c").as("cb"), col("p")), Seq("p"))
        .filter(col("ia") < col("ib") &&
          expr("least(ca, cb) >= (4 * greatest(ca, cb) + 4) div 5"))
        .select("ia", "ib")
    }
    def verify(c: DataFrame): DataFrame = c
      .join(setsDf.select(col("doc_id").as("ia"), col("sh").as("sa")), Seq("ia"))
      .join(setsDf.select(col("doc_id").as("ib"), col("sh").as("sb")), Seq("ib"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("i") * lit(1.0) /
        (size(col("sa")) + size(col("sb")) - col("i")))
      .filter(col("jac") >= 0.8)
      .select(col("ia"), col("ib"), round(col("jac"), 4).as("j"))
    t("A distinct-then-verify")(verify(candRaw.distinct()).orderBy("ia","ib").count())
    t("B verify-all-dedupe-late")(verify(candRaw).distinct().orderBy("ia","ib").count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("A aqe-off")(verify(candRaw.distinct()).orderBy("ia","ib").count())
    t("B aqe-off")(verify(candRaw).distinct().orderBy("ia","ib").count())
    spark.stop()
  }
}
