package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-cliff smoke for the shuffle-heavy dedup family (VERDICT r8
  * item 7): build a 10×-sf0.1 ("sf1") documents corpus ONCE under
  * /tmp and run d1/d4/d5/l6/p2 against it, printing per-entry wall
  * times next to their sf0.1 times. The sf0.1 extras all fit in one
  * shuffle wave at local[32]; this checks nothing falls off a cliff
  * (pair explosion, skewed bucket, driver materialization) when the
  * corpus is 10× bigger than the bench SF.
  *
  * The scaled corpus keeps the near-dup density CONSTANT instead of
  * clone-exploding it: copy 0 is sf0.1 verbatim; copy k>0 suffixes
  * every word with k (word-3-gram shingles ⇒ within-copy Jaccard is
  * preserved exactly, cross-copy overlap is zero) and offsets doc_id
  * by k·10⁷. So the planted near-dup pairs replicate 10× — the same
  * per-partition load a real 10× corpus would carry — without every
  * LSH bucket degenerating into a 10-clone clique.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.checkpointDir", "/tmp/graft_sf1_ckpt")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_sf1"
    val docsPath = new java.io.File(s"$dir/documents.parquet")
    if (!docsPath.exists()) {
      val base = spark.read.parquet(s"$src/documents.parquet")
      val copies = (0 until 10).map { k =>
        if (k == 0) base
        else base
          .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
          .withColumn("text",
            regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1" + k.toString))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
      copies.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      println(s"built $dir/documents.parquet")
    }

    // d8 gets its own 10× corpus: the 1-digit word suffix above makes
    // CROSS-COPY pairs edit-distance near-dups (each word differs by
    // one substitution — ≤ 8 inside a 64-char prefix), so d8's true
    // output grows 43× at 10× docs and any ratio measures output, not
    // blocking. A 3-char suffix puts every cross-copy prefix pair
    // > 8 edits apart (≥ 3 words × 3 chars), restoring the constant
    // near-dup density every other family's scaled corpus keeps.
    val dirD8 = "/tmp/graft_sf1_d8"
    val d8Path = new java.io.File(s"$dirD8/documents.parquet")
    if (!d8Path.exists()) {
      val base = spark.read.parquet(s"$src/documents.parquet")
      val copies = (0 until 10).map { k =>
        if (k == 0) base
        else base
          .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
          .withColumn("text",
            regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1" + (k.toString * 3)))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
      copies.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dirD8/documents.parquet")
      println(s"built $dirD8/documents.parquet")
    }

    // 10× embeddings for the ANN family (VERDICT r9 item 8): copy 0
    // verbatim; copy k>0 offsets vec_id and ROTATES the vector left by
    // k dimensions — norm (and the int8 quantization grid) preserved,
    // direction changed, so copies land in DIFFERENT LSH/IVF/PQ cells
    // and bucket density stays constant instead of 10-clone cliques,
    // the load profile a genuinely 10×-bigger corpus has.
    val embPath = new java.io.File(s"$dir/embeddings.parquet")
    if (!embPath.exists()) {
      val base = spark.read.parquet(s"$src/embeddings.parquet")
      val copies = (0 until 10).map { k =>
        if (k == 0) base
        else base
          .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
          .withColumn("embedding", concat(
            expr(s"slice(embedding, ${k + 1}, size(embedding) - $k)"),
            expr(s"slice(embedding, 1, $k)")))
      }
      copies.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"built $dir/embeddings.parquet")
    }

    // 10× relational tables for the BINDING set's smoke (VERDICT r10
    // task 8): facts scale 10× with copy-k key offsets high above the
    // real keyspace (orderkey < 10⁷ at sf0.1) so lineitem⋈orders
    // still joins 1:1 within each copy; dims stay fixed — 10× facts
    // per dim row, the load profile of a 10× day over a stable
    // customer base. Dims + events copy verbatim so Tables resolves.
    val relPath = new java.io.File(s"$dir/orders.parquet")
    if (!relPath.exists()) {
      def scaleFact(table: String, key: String): Unit = {
        val base = spark.read.parquet(s"$src/$table.parquet")
        (0 until 10).map { k =>
          if (k == 0) base
          else base.withColumn(key, col(key) + lit(k * 100000000L))
        }.reduce(_.unionAll(_)).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/$table.parquet")
      }
      scaleFact("lineitem", "l_orderkey")
      scaleFact("orders", "o_orderkey")
      for (t <- Seq("customer", "supplier", "part", "nation", "region", "events"))
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      println(s"built $dir relational tables")
    }

    // 10× events for the sketch family (r12: k4/k5/k6 read events) —
    // the shared dir keeps events VERBATIM so the relational smoke's
    // committed numbers stay comparable; the sketches get their own
    // 10×-events dir: event_id offset per copy, SAME user/value base
    // (10× traffic over a stable population — the regime sketches
    // exist for; grid/counter sizes must not grow with it).
    val dirEv = "/tmp/graft_sf1_ev"
    val evPath = new java.io.File(s"$dirEv/events.parquet")
    if (!evPath.exists()) {
      val base = spark.read.parquet(s"$src/events.parquet")
      (0 until 10).map { k =>
        if (k == 0) base
        else base.withColumn("event_id", col("event_id") + lit(k * 1000000000L))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dirEv/events.parquet")
      println(s"built $dirEv/events.parquet")
    }
    val sketchNames = Set("k4_countmin_freq", "k5_ams_f2", "k6_theta_intersect")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("d1_minhash_neardup", "d4_neardup_clusters",
        "d5_dedup_survivors", "l6_span_dedup", "p2_manifest_pipeline",
        // the queries the binding 2× bar is computed from (r11):
        "q04_multi_join", "q06_window", "l2_jaccard_pairs", "l5_tfidf_top3")
    def time(n: String, d0: String): (Double, Long) = {
      val d =
        if (n == "d8_edit_distance_pairs" && d0 == dir) dirD8
        else if (sketchNames(n) && d0 == dir) dirEv
        else d0
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // warm both dirs once so scan/codegen warmup doesn't skew the ratio
    names.foreach { n => time(n, src); time(n, dir) }
    println(f"${"entry"}%-22s ${"sf0.1"}%8s ${"sf1"}%8s  ratio  rows(sf1)")
    var worst = 0.0
    for (n <- names) {
      val (t01, _) = time(n, src)
      val (t1, rows) = time(n, dir)
      worst = math.max(worst, t1 / t01)
      println(f"$n%-22s $t01%7.2fs $t1%7.2fs  ${t1 / t01}%5.1fx  $rows%d")
    }
    println(f"worst 10x-data time ratio: $worst%.1fx (cliff if >> 10x)")
    spark.stop()
  }
}
