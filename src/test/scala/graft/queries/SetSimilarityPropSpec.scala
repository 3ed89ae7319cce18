package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized exactness check for the prefix-filtered set-similarity
  * join: on generated corpora (near-dup clusters by token mutation,
  * unrelated docs, sub-shingle shorts), `TextOps.jaccardPairs` must
  * equal a naive all-pairs Jaccard computed in plain Scala — every
  * pair, every value. Seeds are fixed so runs are deterministic, but
  * the corpora exercise shapes the parquet fixture never hits
  * (singleton shingle sets, j exactly at the 0.8 boundary, duplicate
  * docs).
  */
class SetSimilarityPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Naive ground truth over whitespace token streams. */
  private def naivePairs(docs: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
    def shingles(t: String): Set[String] =
      t.split(' ').sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.8
    } yield (ia, ib, math.rint(j * 10000) / 10000)).toSet
  }

  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Array.tabulate(40)(i => s"w$i")
    def doc(n: Int): String =
      Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val out = Seq.newBuilder[(Long, String)]
    var id = 0L
    // near-dup clusters: a base doc plus mutations of 0..3 tokens
    for (_ <- 1 to 8) {
      val toks = doc(12 + rnd.nextInt(20)).split(' ')
      out += ((id, toks.mkString(" "))); id += 1
      for (m <- 0 to rnd.nextInt(3)) {
        val t2 = toks.clone()
        for (_ <- 0 to m)
          t2(rnd.nextInt(t2.length)) = vocab(rnd.nextInt(vocab.length))
        out += ((id, t2.mkString(" "))); id += 1
      }
    }
    // exact duplicates (j = 1.0) and unrelated/short docs
    val dup = doc(15)
    out += ((id, dup)); id += 1
    out += ((id, dup)); id += 1
    for (_ <- 1 to 10) { out += ((id, doc(1 + rnd.nextInt(4)))); id += 1 }
    for (_ <- 1 to 10) { out += ((id, doc(25))); id += 1 }
    out.result()
  }

  test("termCounts kernel matches Spark split(text,' ') semantics") {
    // l5's tokenizer must agree with split(regex, -1): empties between
    // consecutive separators and a trailing empty are real tokens.
    val rnd = new scala.util.Random(7)
    val cases = Seq("", " ", "a", "a b", "a  b", "a b ", " a", "a a a",
      "the the the") ++
      (1 to 200).map(_ => (0 to rnd.nextInt(12)).map(_ =>
        Seq("", "a", "bb", "the", "x1")(rnd.nextInt(5))).mkString(" "))
    for (s <- cases) {
      val expected = s.split(" ", -1).toSeq
        .groupBy(identity).map { case (t, g) => (t, g.size) }
      val got = graft.functions.HashOps.termCounts(s).toMap
      assert(got == expected, s"termCounts('$s')")
    }
  }

  test("trigramHashes pack is injective and order-equivalent to string trigrams") {
    val rnd = new scala.util.Random(11)
    val cases = Seq("", "ab", "abc", "aaaa", "abcabc") ++
      (1 to 100).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    for (s <- cases) {
      val viaStrings = graft.functions.HashOps.trigrams(s)
        .map(t => (t(0).toLong << 32) | (t(1).toLong << 16) | t(2).toLong)
        .sorted.toSeq
      val packed = graft.functions.HashOps.trigramHashes(s).toSeq
      assert(packed == viaStrings, s"trigramHashes('$s')")
      assert(packed == packed.sorted && packed.distinct == packed)
    }
  }

  test("jaccardPairs equals naive all-pairs Jaccard on generated corpora") {
    import spark.implicits._
    for (seed <- Seq(1L, 42L, 20260812L)) {
      val docs = corpus(seed)
      val got = TextOps.jaccardPairs(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = naivePairs(docs)
      assert(got == want,
        s"seed=$seed missing=${want -- got} extra=${got -- want}")
      assert(want.exists(_._3 == 1.0), s"seed=$seed generator lost its dup pair")
    }
  }

  test("clusterPairs: components of chains, cliques, and isolated pairs") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // triangle 10-11-12, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("ia", "ib")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // default path (small graph → driver union-find) and the forced
    // distributed min-label loop must both produce the same labels
    val fast = DedupOps.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = DedupOps.clusterPairs(pairs, smallGraphLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
    assert(dist == want)
  }

  test("clusterPairs union-find path equals the distributed loop on random graphs") {
    import spark.implicits._
    for (seed <- Seq(11L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val pairs = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.toDF("ia", "ib")
      val fast = DedupOps.clusterPairs(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = DedupOps.clusterPairs(pairs, smallGraphLimit = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"seed=$seed")
    }
  }

  test("clusterPairs falls over to star contraction on a long chain") {
    import spark.implicits._
    // chain 0-1-2-...-40: diameter 40 ≫ maxRounds=3, so min-label
    // propagation cannot converge and the large-star/small-star
    // fallback must produce the (single-component) answer — silently
    // returning half-propagated labels was the r5 failure mode.
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("ia", "ib")
    val got = DedupOps.clusterPairs(pairs, maxRounds = 3, smallGraphLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 40L).map(_ -> 0L).toMap)
  }

  test("reliable checkpoint mode yields identical labels (both algorithms)") {
    import spark.implicits._
    // spark.graft.checkpointDir switches the per-round lineage cut
    // from executor-local blocks to reliable checkpoint() on a shared
    // FS — the durability contract changes, the labels must not.
    // Exercise both the converging min-label path and the
    // star-contraction fallback (maxRounds=3 on a diameter-40 chain).
    val pairs = ((0L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (200L, 201L))).toDF("ia", "ib")
    def labels() = DedupOps.clusterPairs(pairs, smallGraphLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def labelsFallback() = DedupOps
      .clusterPairs(pairs, maxRounds = 3, smallGraphLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (localA, localB) = (labels(), labelsFallback())
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      assert(labels() == localA)
      assert(labelsFallback() == localB)
      // the reliable path actually wrote checkpoint data to the dir
      assert(spark.sparkContext.getCheckpointDir.isDefined)
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("starContractLabels equals union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(7L, 99L)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      // canonical label = min node id in the component
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val minOf = nodes.groupBy(v => find(v.toInt)).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
      val got = DedupOps.starContractLabels(
        edges.toDF("u", "v")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == minOf, s"seed=$seed")
    }
  }

  test("triangle-salted candidate join equals the unsalted join on hot buckets") {
    import spark.implicits._
    // planted hot bucket: 30 near-identical docs (boilerplate) collide
    // in every band — the n²/2 single-key case the salt spreads over
    // g(g+1)/2 join keys — plus a normal mixed corpus
    val rnd = new scala.util.Random(5L)
    val vocab = Array.tabulate(40)(i => s"w$i")
    val boiler = Array.fill(20)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val docs = (0L until 30L).map(i => (i, boiler)) ++
      corpus(5L).map { case (id, t) => (id + 100L, t) }
    val plain = DedupOps.minhashPairs(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain.size >= 30 * 29 / 2, "hot bucket must actually be hot")
    for (g <- Seq(2, 4, 7)) {
      val salted = DedupOps.minhashPairs(docs.toDF("doc_id", "text"),
          saltGroups = g)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == plain,
        s"g=$g missing=${plain -- salted} extra=${salted -- plain}")
    }
  }

  test("minhashPairs finds no false positives and >=90% of exact pairs") {
    import spark.implicits._
    for (seed <- Seq(1L, 42L)) {
      val docs = corpus(seed)
      val got = DedupOps.minhashPairs(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = naivePairs(docs)
      assert((got -- want).isEmpty, s"seed=$seed false positives: ${got -- want}")
      assert(got.size >= (want.size * 0.9).ceil.toInt,
        s"seed=$seed recall ${got.size}/${want.size}")
    }
  }

  test("fuzzyDecontaminate equals naive cross-frame Jaccard on generated corpora") {
    import spark.implicits._
    // Train/eval split of a generated near-dup corpus: eval docs are
    // the cluster bases, train docs their mutations plus unrelated
    // noise. Mutations are ≤2 tokens of ≥25, so true matches sit
    // comfortably above τ=0.8 where 8×4 banding recall is ~1 — and
    // seeds are FIXED, so the assertion is deterministic equality
    // against the naive per-(train, eval) Jaccard aggregate, exactly
    // like the l6/salted-join differentials.
    def naiveCross(train: Seq[(Long, String)], eval: Seq[(Long, String)])
        : Map[Long, (Long, Double)] = {
      def sh(t: String): Set[String] =
        t.split(' ').sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val es = eval.map { case (id, t) => id -> sh(t) }.filter(_._2.nonEmpty)
      train.flatMap { case (tid, t) =>
        val ts = sh(t)
        if (ts.isEmpty) Nil
        else {
          val js = es.flatMap { case (_, e) =>
            val i = (ts & e).size
            val j = i.toDouble / (ts.size + e.size - i)
            if (j >= 0.8) Some(math.rint(j * 10000) / 10000) else None
          }
          if (js.isEmpty) Nil else Seq(tid -> ((js.size.toLong, js.max)))
        }
      }.toMap
    }
    for (seed <- Seq(3L, 11L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(60)(i => s"v$i")
      def doc(n: Int): String =
        Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val eval = (0L until 6L).map(i => (i, doc(25 + rnd.nextInt(15))))
      val train = Seq.newBuilder[(Long, String)]
      var id = 100L
      for ((_, base) <- eval; m <- 0 to rnd.nextInt(2)) {
        val t2 = base.split(' ')
        for (_ <- 0 to m) t2(rnd.nextInt(t2.length)) = vocab(rnd.nextInt(vocab.length))
        train += ((id, t2.mkString(" "))); id += 1
      }
      train += ((id, eval.head._2)); id += 1 // verbatim copy, j = 1.0
      for (_ <- 1 to 12) { train += ((id, doc(30))); id += 1 }
      val trainSeq = train.result()
      val got = DedupOps.fuzzyDecontaminate(
          trainSeq.toDF("doc_id", "text"), eval.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val want = naiveCross(trainSeq, eval)
      assert(got == want,
        s"seed=$seed missing=${want.keySet -- got.keySet} " +
          s"extra=${got.keySet -- want.keySet} " +
          s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }}")
    }
  }
}
