package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the approximate / non-SQL-expressible pipeline ops:
  * recall vs their exact ground truths, determinism, classifier
  * behavior on genuinely separable corpora, multimodal plumbing. */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("d1 MinHash-LSH recall >= 0.9 vs exact Jaccard pairs; no false positives") {
    val exact = TextOps.defs.find(_.name == "l2_jaccard_pairs").get
      .fn(spark, sf).select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.defs.find(_.name == "d1_minhash_neardup").get
      .fn(spark, sf).select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // candidates are verified with exact Jaccard → no false positives
    assert(lsh.subsetOf(exact))
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=${exact.size} lsh=${lsh.size}")
  }

  test("split rule is total over the Long id domain (no wrap/overflow divergence)") {
    // Before r15 the rule was (id * 2654435761) % 1000 — Spark
    // (non-ANSI) silently wraps the Long product for id >= ~3.47e9
    // while DuckDB raises a BIGINT-overflow error: the engines
    // diverge exactly at the id scale a 100 TB corpus reaches. The
    // masked form ((id & 0x7fffffff) * 2654435761) tops out at
    // ~5.7e18 < Long.MaxValue, so BOTH engines evaluate it exactly.
    import spark.implicits._
    val hugeIds = Seq(3470000000L, Long.MaxValue, Long.MaxValue - 12345L,
      4294967296L, 1L << 62)
    val got = CorpusPipeline.leakageSafeSplit(
        hugeIds.toDF("doc_id"), Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    hugeIds.foreach { id =>
      val m = java.lang.Math.floorMod((id & 2147483647L) * 2654435761L, 1000L)
      val want = if (m < 800) "train" else if (m < 900) "val" else "test"
      assert(got(id) === want, s"id=$id")
    }
    // and the mask never fires at the generated-corpus id scale: the
    // masked and unmasked rules agree on every real doc_id, so every
    // committed oracle hash is unaffected by the r15 change
    val docs = graft.Tables.documents(spark, sf)
    val diverging = docs.filter(
      pmod(col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L)) =!=
        pmod(col("doc_id") * lit(2654435761L), lit(1000L))).count()
    assert(diverging === 0L)
  }

  test("p7 leakage-safe split: clusters never straddle splits; singletons = t10 rule") {
    import spark.implicits._
    def bucket(id: Long): String = {
      val m = java.lang.Math.floorMod((id & 2147483647L) * 2654435761L, 1000L)
      if (m < 800) "train" else if (m < 900) "val" else "test"
    }
    // find two ids whose OWN buckets differ, then cluster them: the
    // guard must override the per-doc rule for the non-representative
    val a = (1L to 500L).find(i => bucket(i) == "train").get
    val b = (1L to 500L).find(i => i != a && bucket(i) == "test").get
    val c = (1L to 500L).find(i => bucket(i) == "val").get // singleton
    val docs = Seq(a, b, c).toDF("doc_id")
    val clusters = Seq((a, math.min(a, b)), (b, math.min(a, b)))
      .toDF("doc_id", "cluster_id")
    val got = CorpusPipeline.leakageSafeSplit(docs, clusters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val rep = math.min(a, b)
    assert(got(a) === (rep, bucket(rep)))
    assert(got(b) === (rep, bucket(rep))) // naive rule said "test" — overridden
    assert(bucket(b) !== bucket(rep), "fixture must exercise the override")
    assert(got(c) === (c, bucket(c))) // singleton keeps its own bucket
  }

  test("p7 on the real corpus: zero near-dup pairs straddle a split boundary") {
    val docs = graft.Tables.documents(spark, sf)
    val pairs = DedupOps.minhashPairs(docs).select("ia", "ib")
    val split = CorpusPipeline.leakageSafeSplit(docs,
      DedupOps.clusterPairs(pairs))
    val sa = split.select(col("doc_id").as("ia"), col("split").as("sa"))
    val sb = split.select(col("doc_id").as("ib"), col("split").as("sb"))
    val crossers = pairs.join(sa, "ia").join(sb, "ib")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossers === 0L)
    // and the guard is not vacuous: some clustered doc's own-id bucket
    // differs from its assigned split on this corpus
    val overridden = split.filter(col("rep") =!= col("doc_id"))
      .filter(
        when(pmod(col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L)) < 800, "train")
          .when(pmod(col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L)) < 900, "val")
          .otherwise("test") =!= col("split")).count()
    assert(overridden > 0L, "corpus fixture never exercises the override")
  }

  test("d2 SimHash: planted near-identical docs collide at distance<=3") {
    import spark.implicits._
    // 1-token edit in a 400-token doc: bit-flip count stays small
    // because per-bit majorities have ~sqrt(n) margins
    val base = (1 to 400).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("tok30 ", "tok30x ")), // tiny edit
      (3L, (200 to 600).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(docs)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("a2 ANN-LSH: top-1 neighbor recall >= 0.7 vs exact brute force") {
    val exact = SimilarityOps.annExact(graft.Tables.embeddings(spark, sf))
      .filter(col("rnk") === 1).select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.annLsh(graft.Tables.embeddings(spark, sf))
      .filter(col("rnk") === 1).select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = exact.count(lsh.contains)
    assert(exact.size == 10)
    assert(hits >= 7, s"top-1 recall $hits/10")
    // the a2 ORACLE invariant (r13 promotion): at 24 OR-bands the
    // candidate set holds every exact top-5 neighbor and the exact
    // re-rank reproduces a1 row-for-row — the property that lets a2
    // share a1's DuckDB oracle. Full-row equality, not recall.
    val exactAll = SimilarityOps.annExact(graft.Tables.embeddings(spark, sf))
      .collect().map(_.toSeq).toSeq
    val lsh24 = SimilarityOps.annLsh(graft.Tables.embeddings(spark, sf),
      nBands = 24).collect().map(_.toSeq).toSeq
    assert(exactAll == lsh24)
  }

  test("a11 blocked serving: beyond-broadcast block split equals one broadcast") {
    // the serveTopK scale path: a query table too large for a single
    // broadcast splits into qid-ordered blocks, one candidate scan per
    // block; block qids are disjoint so shortlists union without
    // interference. Exactness must not depend on the block size.
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.limit(40).select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    def rows(blockRows: Int) = graft.functions.VectorOps
      .serveTopK(queries, emb, 5, blockRows)
      .collect().map(_.toSeq).toSeq
    val whole = rows(Int.MaxValue)
    assert(whole.size == 40 * 5)
    assert(rows(7) == whole)   // 6 uneven blocks
    assert(rows(40) == whole)  // exact fit
  }

  test("a10 MIPS: norm-augmentation reduction exact; LSH serves it") {
    import spark.implicits._
    val rows = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val m2 = rows.map(_._2.map(v => v * v).sum).max
    // exact dot top-5 (the a10 entry's kernel) per query
    val exact = graft.functions.VectorOps
      .mipsTopK(graft.Tables.embeddings(spark, sf), 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    // the reduction: x~ = [x; sqrt(M^2-|x|^2)], q~ = [q; 0] makes every
    // augmented candidate norm M, so augmented-cosine ORDER == dot ORDER
    val byId = rows.toMap
    (0L until 10L).foreach { q =>
      val qv = byId(q)
      val augTop = rows.filter(_._1 != q).map { case (cid, x) =>
        val aug = math.sqrt(math.max(0.0, m2 - x.map(v => v * v).sum))
        val cos = graft.functions.VectorOps.dot(qv, x) /
          (math.sqrt(qv.map(v => v * v).sum) *
            math.sqrt(x.map(v => v * v).sum + aug * aug))
        (cid, cos)
      }.sortBy { case (cid, c) => (-c, cid) }.take(5).map(_._1).toList
      assert(augTop == exact(q), s"q=$q aug=$augTop exact=${exact(q)}")
    }
    // the serving path: hyperplane LSH over the AUGMENTED vectors
    // answers MIPS queries — top-1 exact MIPS neighbor recalled like a2
    val aug = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])](graft.Enc.longFloatArr)
      .map { case (id, e) =>
        val n2 = e.map(v => v.toDouble * v).sum
        (id, e :+ math.sqrt(math.max(0.0, m2 - n2)).toFloat)
      }(graft.Enc.longFloatArr).toDF("vec_id", "embedding")
    val lsh = SimilarityOps.annLsh(aug)
      .filter(col("rnk") === 1).select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0L until 10L).count(q => lsh.get(q).contains(exact(q).head))
    assert(hits >= 6, s"MIPS-via-LSH top-1 recall $hits/10")
  }

  test("a9 random projection: JL norm preservation, determinism, matrix sparsity") {
    val a9 = SimilarityOps.defs.find(_.name == "a9_random_projection").get
    val proj = a9.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (1 to 16).map(j => r.getDouble(j)).toArray).toMap
    val orig = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(proj.keySet == orig.keySet && proj.nonEmpty)
    // E[||y||^2] = ||x||^2 under the Achlioptas matrix: the MEAN ratio
    // concentrates near 1 even at k=16; per-vector ratios spread with
    // variance ~2/k but stay inside a wide safety band
    val ratios = orig.collect { case (id, x) if x.map(v => v * v).sum > 0 =>
      proj(id).map(v => v * v).sum / x.map(v => v * v).sum
    }.toSeq
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.25, s"mean norm ratio $mean")
    assert(ratios.count(r => r > 0.1 && r < 3.5).toDouble / ratios.size >= 0.95,
      s"norm-ratio tail too fat: ${ratios.count(r => r <= 0.1 || r >= 3.5)}")
    // deterministic: a second run is identical (pure function of data)
    val again = a9.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(j => r.getDouble(j)).toArray).toMap
    assert(proj.keys.forall(id => proj(id).sameElements(again(id))))
    // the matrix really is the declared sparse sign family: ~2/3 zeros
    val entries = for (i <- 0 until 64; j <- 0 until 16) yield {
      ((i.toLong * 1000003L + j * 37L + 17L) * 2654435761L) % 6
    }
    val zeros = entries.count(r => r != 0 && r != 1).toDouble / entries.size
    assert(zeros > 0.55 && zeros < 0.78, s"zero fraction $zeros")
    // at least one +1 and one -1 per output dim (no dead components)
    for (j <- 0 until 16) {
      val col = (0 until 64).map(i =>
        ((i.toLong * 1000003L + j * 37L + 17L) * 2654435761L) % 6)
      assert(col.contains(0L) && col.contains(1L), s"dim $j degenerate")
    }
  }

  test("d3 embedding near-dup EQUALS exact threshold pairs (sf0.01 + sf0.1)") {
    // The d3 oracle is the exact-pair SQL, so banding must recall
    // every ≥τ pair (deterministic geometry — this asserts the claim
    // at both the correctness SF and the bench SF).
    for (dir <- Seq(sf, "/root/testdata/sf0.1")) {
      val emb = graft.Tables.embeddings(spark, dir)
      val exact = graft.functions.VectorOps.cosinePairsAbove(emb, 0.45)
        .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = DedupOps.embeddingNearDup(emb)
        .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty, s"threshold should catch some pairs at $dir")
      assert(lsh == exact,
        s"$dir: lsh=${lsh.size} exact=${exact.size} missed=${(exact -- lsh).size}")
    }
  }

  test("d3/a2 IDs-only band form equals the vector-carrying form") {
    // The (bands × dim) scale switch must be a pure execution-strategy
    // choice: same signatures, same candidates, same scores.
    val emb = graft.Tables.embeddings(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(DedupOps.embeddingNearDup(emb, carryVectors = Some(true))) ==
      rows(DedupOps.embeddingNearDup(emb, carryVectors = Some(false))))
    assert(rows(SimilarityOps.annLsh(emb, carryVectors = Some(true))) ==
      rows(SimilarityOps.annLsh(emb, carryVectors = Some(false))))
  }

  test("t3 langid classifies genuinely separable corpora correctly") {
    import spark.implicits._
    val en = "the quick brown fox jumps over the lazy dog and runs away with them"
    val fr = "le renard brun saute par dessus le chien paresseux et court avec eux"
    val de = "der schnelle braune fuchs springt ueber den faulen hund und rennt weg"
    def noisy(s: String, salt: Int) = s.split(" ").map(w =>
      if (w.hashCode % 7 == salt % 7) w + "x" else w).mkString(" ")
    val labeled = (0 until 30).flatMap(i => Seq(
      (i * 3 + 0L, noisy(en, i), "en"),
      (i * 3 + 1L, noisy(fr, i), "fr"),
      (i * 3 + 2L, noisy(de, i), "de")))
      .toDF("doc_id", "text", "lang")
    val pred = TextAnalysis.langId(labeled, labeled)
      .join(labeled.select("doc_id", "lang"), Seq("doc_id"))
    val acc = pred.filter(col("predicted") === col("lang")).count().toDouble /
      pred.count()
    assert(acc >= 0.95, s"accuracy=$acc")
  }

  test("t4 fingerprints are deterministic and edit-sensitive") {
    val fp = TextAnalysis.defs.find(_.name == "t4_fingerprint").get
    val a = fp.fn(spark, sf).select("doc_id", "fingerprint").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = fp.fn(spark, sf).select("doc_id", "fingerprint").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size > a.size / 2) // not all collapsing
  }

  test("l7 content-defined chunking: lossless, shift-robust, boundary-deterministic") {
    import graft.functions.HashOps
    val rnd = new scala.util.Random(19)
    def randText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // lossless segmentation: chunks tile the byte stream exactly
    for (t <- Seq("", "x", randText(40), randText(2000),
      "naïve café 東京 " * 30)) {
      val cs = HashOps.contentChunks(t)
      val n = t.getBytes("UTF-8").length
      if (n == 0) assert(cs.isEmpty)
      else {
        assert(cs.head._1 == 0 && cs.map(_._2).sum == n)
        cs.sliding(2).foreach {
          case Array((s1, l1, _), (s2, _, _)) => assert(s2 == s1 + l1)
          case _ => ()
        }
      }
    }
    // a 2000-byte random text has boundaries w.h.p. (P(no cut) ≈
    // (63/64)^1985 ≈ 3e-14 — and the seed is fixed anyway)
    val base = randText(2000)
    val cs = HashOps.contentChunks(base)
    assert(cs.length >= 2, s"expected multiple chunks, got ${cs.length}")
    // SHIFT ROBUSTNESS — the property fixed-size blocking lacks:
    // appending a tail re-chunks only the final chunk
    val tailed = HashOps.contentChunks(base + "zzz")
    assert(tailed.dropRight(1).map(c => (c._2, c._3)).toSeq ==
      cs.dropRight(1).map(c => (c._2, c._3)).toSeq)
    // ...and an insertion near the END leaves every chunk before the
    // insertion point's chunk identical (prefix stability)
    val cut = cs.last._1 // start of the last chunk
    val edited = base.substring(0, cut) + "INSERTED" + base.substring(cut)
    val editedCs = HashOps.contentChunks(edited)
    assert(editedCs.take(cs.length - 1).map(c => (c._2, c._3)).toSeq ==
      cs.dropRight(1).map(c => (c._2, c._3)).toSeq)
    // deterministic
    assert(HashOps.contentChunks(base).toSeq == cs.toSeq)
    // expected chunk size ≈ 64 B under the low-6-bit rule
    val mean = cs.map(_._2).sum.toDouble / cs.length
    assert(mean > 20 && mean < 200, s"mean chunk $mean")
  }

  test("t4 rolling window update equals the direct recompute (corpus + adversarial)") {
    import graft.functions.HashOps
    // the whole corpus: every doc's rolling hashes == direct hashes
    val texts = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    texts.foreach { t =>
      assert(HashOps.rollingShingleHashes(t, 4).toSeq ==
        HashOps.directShingleHashes(t, 4).toSeq)
    }
    // adversarial: empty tokens, repeated tokens (dedup branch),
    // multi-byte UTF-8, exactly-k and below-k token counts
    val hard = Seq("", "a", "a b c", "a b c d", "a b c d e f g a b c d",
      "x x x x x x", "  a  b ", "naïve café 東京 données über straße voilà",
      "a b c d e")
    hard.foreach { t =>
      assert(HashOps.rollingShingleHashes(t, 4).toSeq ==
        HashOps.directShingleHashes(t, 4).toSeq, s"text='$t'")
    }
    // STRING_SPLIT parity: a trailing space keeps its empty token, so
    // "a b c d " has 5 tokens -> 2 windows (DuckDB string_split keeps
    // trailing empties; Java split(' ') would drop it -> 1 window)
    assert(HashOps.rollingShingleHashes("a b c d ", 4).length == 2)
    assert(HashOps.rollingShingleHashes("a b c", 4).isEmpty)
    // randomized: small alphabet forces window collisions (dedup path)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val t = (0 until rnd.nextInt(30))
        .map(_ => ('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(2)))
        .mkString(" ")
      assert(HashOps.rollingShingleHashes(t, 4).toSeq ==
        HashOps.directShingleHashes(t, 4).toSeq, s"text='$t'")
    }
  }

  test("t7 packing: budget overflow bounded, every chunk packed exactly once") {
    val t7 = TextAnalysis.defs.find(_.name == "t7_pack_chunks").get.fn(spark, sf)
    val rows = t7.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // a sequence holds ≤ 512 tokens plus at most one boundary-straddling
    // chunk's remainder (chunks are ≤ 32 tokens)
    assert(rows.forall(_._5 <= 512 + 31))
    // seq ids are dense from 0 within each (source, shard)
    for (((_, _), seqs) <- rows.groupBy(r => (r._1, r._2))) {
      val ids = seqs.map(_._3).sorted
      assert(ids.head == 0L && ids.last == ids.size - 1L)
    }
    // chunk conservation: packed chunk count == t6's total chunk count
    val t6 = TextAnalysis.defs.find(_.name == "t6_token_chunks").get.fn(spark, sf)
    assert(rows.map(_._4).sum == t6.count())
  }

  test("m1/m2 multimodal plumbing: schema, determinism, frame stride") {
    val m1 = MultimodalOps.defs.find(_.name == "m1_media_features").get
      .fn(spark, sf)
    val rows = m1.collect()
    assert(rows.length == 500)
    // histogram is L1-normalized → sums to ~1
    assert(rows.forall(r => math.abs(r.getDouble(3) - 1.0) < 0.01))
    val feats = MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, sf))
    assert(feats.schema("feature").dataType.simpleString == "array<float>")
    val m2 = MultimodalOps.defs.find(_.name == "m2_frame_sample").get
      .fn(spark, sf)
    import spark.implicits._
    val idx = m2.select("frame_idx").as[Int].collect()
    assert(idx.nonEmpty && idx.forall(_ % 2 == 0)) // stride 2 keeps even frames
    // m3: resized payloads have exactly outW×outH bytes; an identity
    // resize (out dims = decoded dims) must return the original raster
    // byte-for-byte — REAL decode: the payload is an actual PNG, so
    // this round-trips the codec, not index arithmetic
    val resized = MultimodalOps.resizeMedia(
      MultimodalOps.mediaTable(spark, sf), outW = 32, outH = 32)
      .as[(Long, Int, Int, Array[Byte])].collect()
    assert(resized.nonEmpty &&
      resized.forall { case (_, w, h, p) => w == 32 && h == 32 && p.length == 1024 })
    val idPayload = Array.tabulate(16)(i => (i * 7).toByte)
    val idMedia = Seq(
      (0L, MultimodalOps.encodeGrayPng(idPayload, 4, 4),
        MultimodalOps.MediaMeta(0, 4, 4, 16)))
      .toDF("media_id", "payload", "meta")
    val out = MultimodalOps.resizeMedia(idMedia, outW = 4, outH = 4)
      .as[(Long, Int, Int, Array[Byte])].collect()(0)._4
    assert(out.toSeq == idPayload.toSeq)
  }

  test("media decoder SPI: a mounted decoder takes over its kind; absence keeps the stub") {
    import spark.implicits._
    val media = Seq(
      (1L, Array.tabulate(32)(i => (i * 3).toByte), MultimodalOps.MediaMeta(1, 8, 8, 32)),
      (2L, Array.tabulate(32)(i => (i * 3).toByte), MultimodalOps.MediaMeta(2, 8, 8, 32)))
      .toDF("media_id", "payload", "meta")
    def featOf(): Map[Long, Seq[Float]] =
      MultimodalOps.decodeFeatures(media).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](2).toSeq).toMap
    graft.functions.MediaDecoders.clearProgrammatic()
    val stub = featOf()
    // no decoder mounted: both kinds use the low-nibble byte stub
    assert(stub(1L) == stub(2L) && math.abs(stub(1L).sum - 1.0f) < 1e-3)
    // mount a fake "codec" for kind 1 only: every decoded sample lands
    // in intensity bin 15, so the feature must flip to one-hot
    graft.functions.MediaDecoders.register(new graft.functions.MediaDecoder {
      override def kinds: Set[Int] = Set(1)
      override def decodeRaster(kind: Int, payload: Array[Byte]) =
        if (payload.isEmpty) None
        else Some((payload.length, 1, Array.fill(payload.length)(0xF0)))
    })
    try {
      val decoded = featOf()
      assert(decoded(1L)(15) == 1.0f && decoded(1L).take(15).forall(_ == 0.0f))
      // unclaimed kind keeps the stub — a decoder can only ADD decode
      assert(decoded(2L) == stub(2L))
      // the built-in ImageIO instance decodes a real PNG through the SPI
      val png = MultimodalOps.encodeGrayPng(Array.tabulate(16)(i => (i * 7).toByte), 4, 4)
      val r = graft.functions.ImageIODecoder.decodeRaster(0, png)
      assert(r.exists { case (w, h, px) =>
        w == 4 && h == 4 && px.toSeq == (0 until 16).map(_ * 7) })
      assert(graft.functions.ImageIODecoder.decodeRaster(0, Array[Byte](1, 2, 3)).isEmpty)
    } finally graft.functions.MediaDecoders.clearProgrammatic()
    // after unmount the stub semantics (and so committed hashes) return
    assert(featOf()(1L) == stub(1L))
  }

  test("m4 PNG round-trip: real ImageIO decode recovers the source pixels") {
    import spark.implicits._
    // adversarial texts: empty, shorter than the grid, longer, and
    // multi-byte UTF-8 (the kernel operates on ENCODED bytes)
    val docs = Seq(
      (0L, ""),
      (1L, "short"),
      (2L, "x" * 500),
      (3L, "héllo wörld ünïcode ✓✓✓")
    ).toDF("doc_id", "text")
    val got = MultimodalOps.pngRoundtrip(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))))
      .toMap
    def sums(text: String): (Long, Long) = {
      val b = text.getBytes("UTF-8")
      def at(i: Int): Long = if (i < b.length && i < 256) (b(i) & 0xFF).toLong else 0L
      val px = (0 until 256).map(at).sum
      val rz = (0 until 64).map(i => at((i / 8) * 32 + (i % 8) * 2)).sum
      (px, rz)
    }
    for ((id, text) <- Seq((0L, ""), (1L, "short"), (2L, "x" * 500),
        (3L, "héllo wörld ünïcode ✓✓✓"))) {
      val (pxSum, rzSum) = sums(text)
      assert(got(id) == ((16, 16, pxSum, rzSum)), s"doc $id")
    }
    // decode is REAL: a random pixel grid survives encode→PNG→decode
    // byte-for-byte (PNG gray8 is lossless)
    val rnd = new scala.util.Random(11L)
    val px = Array.fill(256)(rnd.nextInt(256).toByte)
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 16, 16, px)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    assert(png.take(8).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
      "payload is genuine PNG (magic bytes)")
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val back = dec.getRaster.getSamples(0, 0, 16, 16, 0, new Array[Int](256))
    assert(back.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("cosine_sim Expression: SQL + Column paths match double math on floats") {
    import spark.implicits._
    graft.functions.CosineSim.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("cs_t")
    val sql = spark.sql("SELECT cosine_sim(a, b) c FROM cs_t").head().getDouble(0)
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(sql - expect) < 1e-12)
    // on the real embeddings: Expression equals the HOF double math
    val emb = graft.Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val both = emb.as("x").crossJoin(emb.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id")).limit(200)
      .select(
        graft.functions.CosineSim.cosine_sim(col("x.v"), col("y.v")).as("c1"),
        (expr("aggregate(zip_with(x.v, y.v, (p, q) -> p*q), 0D, (acc, z) -> acc + z)") /
          (expr("sqrt(aggregate(x.v, 0D, (acc, z) -> acc + z*z))") *
            expr("sqrt(aggregate(y.v, 0D, (acc, z) -> acc + z*z))"))).as("c2"))
      .collect()
    assert(both.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("cosine_sim rejects wrong arity and non-array args at analysis") {
    import spark.implicits._
    graft.functions.CosineSim.register(spark)
    Seq((1, "x")).toDF("n", "s").createOrReplaceTempView("cs_bad")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(n) FROM cs_bad").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("cosine_sim"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(n, s) FROM cs_bad").collect()
    }
    assert(e2.getMessage.contains("ARRAY<FLOAT>") ||
      e2.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("MinHash UDAF over exploded shingles equals the per-row kernel") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y z w v u t s")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(split(text,' '))-3), " +
          "i -> concat_ws(' ', split(text,' ')[i], split(text,' ')[i+1], split(text,' ')[i+2]))"))
        .as("shingle"))
    val viaUdaf = sh.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.minhash(16)(col("shingle")).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    val viaKernel = docs.as[(Long, String)].collect().map { case (id, t) =>
      val toks = t.split(" ")
      val shingles = toks.sliding(3).map(_.mkString(" ")).toArray
      id -> graft.functions.HashOps.minhashSig(shingles, 16)
    }.toMap
    for ((id, sig) <- viaKernel)
      assert(viaUdaf(id).sameElements(sig), s"doc $id")
  }

  test("a3 ANN-IVF: top-1 neighbor recall >= 0.7 vs exact brute force") {
    // the DEFAULT dial (nProbe=8 of 16 — the approximate regime; the
    // driver entry runs the promoted candidate-complete dial and is
    // oracle-checked against a1 instead)
    val d = "/root/testdata/sf0.01"
    val exact = SimilarityOps.defs.find(_.name == "a1_ann_exact").get
      .fn(spark, d).filter(col("rnk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivf = SimilarityOps.annIvf(graft.Tables.embeddings(spark, d))
      .filter(col("rnk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ivf.size == exact.size)
    val hits = exact.count { case (q, c) => ivf.get(q).contains(c) }
    assert(hits >= (exact.size * 0.7).ceil.toInt,
      s"IVF top-1 recall $hits/${exact.size}")
  }

  test("a6 ANN-PQ: top-1 recall >= 0.9 vs exact; exact sims on the survivors") {
    // the DEFAULT dial (m=8, rerank×k=50 — the approximate regime; the
    // driver entry runs the promoted candidate-complete dial and is
    // oracle-checked against a1 instead)
    val d = "/root/testdata/sf0.01"
    val exact = SimilarityOps.defs.find(_.name == "a1_ann_exact").get
      .fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    val pq = SimilarityOps.annPq(graft.Tables.embeddings(spark, d)).collect()
    val exactTop = exact.collect { case ((q, c), (1L, _)) => q -> c }.toMap
    val pqTop = pq.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pqTop.size == exactTop.size)
    val hits = exactTop.count { case (q, c) => pqTop.get(q).contains(c) }
    assert(hits >= (exactTop.size * 0.9).ceil.toInt,
      s"PQ top-1 recall $hits/${exactTop.size}")
    // the re-rank stage outputs EXACT cosines: any (qid,cid) the PQ
    // result shares with the exact result must carry the same sim
    pq.foreach { r =>
      exact.get((r.getLong(0), r.getLong(2))).foreach { case (_, sim) =>
        assert(math.abs(r.getDouble(3) - sim) < 1e-9,
          s"(${r.getLong(0)},${r.getLong(2)}) pq=${r.getDouble(3)} exact=$sim")
      }
    }
  }

  test("a12: delta fold never touches the base index; serve equals exact top-k") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val d = "/root/testdata/sf0.01"
    SimilarityOps.ensureAnnIndexBase(spark, d)
    def snapshot(sub: String): Map[String, java.nio.file.attribute.FileTime] = {
      val p = Paths.get(SimilarityOps.annWarehousePath, sub)
      Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    }
    val baseBands = snapshot("bands_base")
    val baseVecs = snapshot("vecs_base")
    assert(baseBands.nonEmpty && baseVecs.nonEmpty)
    // the incremental fold: delta generation rewritten, base untouched
    SimilarityOps.foldAnnDelta(spark, d)
    assert(snapshot("bands_base") == baseBands,
      "delta fold must not rewrite the base band index")
    assert(snapshot("vecs_base") == baseVecs,
      "delta fold must not rewrite the base vector store")
    assert(snapshot("bands_delta").nonEmpty)
    // serving from the persisted generations equals the exact answer
    // over the WHOLE corpus (base + delta)
    val served = SimilarityOps.annServePersisted(spark)
      .collect().map(_.toSeq).toSeq
    val exact = SimilarityOps.annExact(graft.Tables.embeddings(spark, d))
      .collect().map(_.toSeq).toSeq
    assert(served == exact)
  }

  test("a14/a15: tombstones serve correctly and compaction drops them physically") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val d = "/root/testdata/sf0.01"
    SimilarityOps.ensureAnnIndexBase(spark, d)
    SimilarityOps.foldAnnDelta(spark, d)
    def snapshot(sub: String): Map[String, java.nio.file.attribute.FileTime] = {
      val p = Paths.get(SimilarityOps.annWarehousePath, sub)
      Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    }
    val baseBands = snapshot("bands_base")
    val deltaBands = snapshot("bands_delta")
    // the tombstone fold writes ONLY the tombstone generation
    SimilarityOps.foldAnnTombstones(spark, d)
    assert(snapshot("bands_base") == baseBands,
      "tombstone fold must not rewrite the base index")
    assert(snapshot("bands_delta") == deltaBands,
      "tombstone fold must not rewrite the delta generation")
    // logical delete (anti-join) ≡ physical delete (compacted) ≡
    // exact top-k over the live corpus
    SimilarityOps.compactAnnIndexWithDeletes(spark, d)
    val logical = SimilarityOps.annServeWithTombstones(spark)
      .collect().map(_.toSeq).toSeq
    val physical = SimilarityOps.annServeCompactedDeletes(spark)
      .collect().map(_.toSeq).toSeq
    assert(logical == physical)
    val exact = SimilarityOps.annExact(
        graft.Tables.embeddings(spark, d).filter(col("vec_id") % 10 =!= 6))
      .collect().map(_.toSeq).toSeq
    assert(logical == exact)
    // the drop is PHYSICAL: no retracted id survives in any compacted
    // file, and the delete actually had something to do
    val nTombs = spark.table("graft_ann_tombs").count()
    assert(nTombs > 0)
    val survivors = spark.table("graft_ann_bands_compactdel")
      .join(spark.table("graft_ann_tombs"), Seq("vec_id"), "left_semi").count() +
      spark.table("graft_ann_vecs_compactdel")
        .join(spark.table("graft_ann_tombs"), Seq("vec_id"), "left_semi").count()
    assert(survivors === 0L)
  }

  test("a16: upsert fold writes only its own generation; new vectors win on both sides") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val d = "/root/testdata/sf0.01"
    SimilarityOps.ensureAnnIndexBase(spark, d)
    SimilarityOps.foldAnnDelta(spark, d)
    def snapshot(sub: String): Map[String, java.nio.file.attribute.FileTime] = {
      val p = Paths.get(SimilarityOps.annWarehousePath, sub)
      Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    }
    val baseBands = snapshot("bands_base")
    val deltaBands = snapshot("bands_delta")
    SimilarityOps.foldAnnUpserts(spark, d)
    assert(snapshot("bands_base") == baseBands,
      "upsert fold must not rewrite the base index")
    assert(snapshot("bands_delta") == deltaBands,
      "upsert fold must not rewrite the delta generation")
    // serve == exact top-k over the corpus with the re-embedded
    // (reversed) vectors substituted — queries included
    val served = SimilarityOps.annServeWithUpserts(spark)
      .collect().map(_.toSeq).toSeq
    val cur = graft.Tables.embeddings(spark, d)
      .withColumn("embedding",
        when(col("vec_id") % 7 === 2, reverse(col("embedding")))
          .otherwise(col("embedding")))
    val exact = SimilarityOps.annExact(cur).collect().map(_.toSeq).toSeq
    assert(served == exact)
    // non-vacuity: the substitution changed the answer for some query
    val stale = SimilarityOps.annExact(graft.Tables.embeddings(spark, d))
      .collect().map(_.toSeq).toSeq
    assert(served != stale, "re-embedding must be observable in the top-k")
  }

  test("a14 plan shape: tombstone anti-joins BROADCAST — the index side never shuffles for the delete") {
    val d = "/root/testdata/sf0.01"
    SimilarityOps.ensureAnnIndexBase(spark, d)
    SimilarityOps.foldAnnDelta(spark, d)
    SimilarityOps.foldAnnTombstones(spark, d)
    val plan = SimilarityOps.annServeWithTombstones(spark)
      .queryExecution.executedPlan.toString
    // the two anti-joins (bands, vecs) against the takedown-sized
    // tombstone table must be broadcast left-antis: at 100 TB the
    // standing index cannot pay a shuffle to honor a takedown list
    val antis = "BroadcastHashJoin .*LeftAnti".r
      .findAllMatchIn(plan).length
    assert(antis >= 2, s"expected >=2 broadcast anti-joins, plan:\n$plan")
    assert(!"SortMergeJoin .*LeftAnti".r.findFirstIn(plan).isDefined,
      s"tombstone anti-join must not sort-merge:\n$plan")
  }

  test("d11: retracted docs stop matching; no standing generation rewritten") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val d = "/root/testdata/sf0.01"
    DedupOps.ensureLshIndexBase(spark, d)
    DedupOps.foldLshDelta(spark, d)
    def snapshot(sub: String): Map[String, java.nio.file.attribute.FileTime] = {
      val p = Paths.get(DedupOps.lshWarehousePath, sub)
      Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    }
    val baseBands = snapshot("bands_base")
    val deltaSets = snapshot("sets_delta")
    DedupOps.foldLshTombstones(spark, d)
    assert(snapshot("bands_base") == baseBands)
    assert(snapshot("sets_delta") == deltaSets)
    val served = DedupOps.lshServeDeltaWithTombstones(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // equals the un-retracted serve minus pairs touching a tombstone
    val full = DedupOps.lshServeDelta(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filterNot { case (ia, ib, _) =>
      ia % 10 == 6 || ib % 10 == 6 }
    assert(served == expected)
    assert(full.size > served.size,
      "fixture must actually retract a matching endpoint")
  }

  test("s27: in-stream epoch compaction bounds live generations; serve equals d9") {
    val d = "/root/testdata/sf0.01"
    // reach inside: run the stream with a known dir layout by calling
    // the public entry, then assert via the compaction primitives
    val served = DedupOps.lshIndexStreamCompactServe(spark, d,
        nBatches = 8, compactEvery = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    DedupOps.foldLshDelta(spark, d)
    val batchAnswer = DedupOps.lshServeDelta(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served == batchAnswer,
      "compacting stream epochs must lose nothing and duplicate nothing")
  }

  test("s28: ANN in-stream epoch compaction bounds generations; serve equals a12") {
    val d = "/root/testdata/sf0.01"
    val served = SimilarityOps.annIndexStreamCompactServe(spark, d,
        nBatches = 8, compactEvery = 3)
      .collect().map(_.toSeq).toSeq
    SimilarityOps.foldAnnDelta(spark, d)
    val batchAnswer = SimilarityOps.annServePersisted(spark)
      .collect().map(_.toSeq).toSeq
    assert(served == batchAnswer,
      "compacting ANN stream epochs must lose nothing and duplicate nothing")
  }

  test("epoch compaction heals a crash-torn compact dir (commit marker)") {
    import spark.implicits._
    val dir = graft.TmpDirs.scratch("s27crash")
    (0L to 3L).foreach { e =>
      DedupOps.foldLshDeltaEpoch(
        Seq((200 + e, s"kappa lambda mu nu xi omicron pi rho doc$e word"))
          .toDF("doc_id", "text"), s"$dir/epoch=$e")
    }
    // simulate a crash mid-compaction: compact=2 has its bands leaf
    // but NOT its sets leaf and NO commit marker — exactly the state
    // a process death between the two parquet writes leaves behind
    spark.read.parquet(s"$dir/epoch=0/bands")
      .write.parquet(s"$dir/compact=2/bands")
    // the torn dir is INVISIBLE: no generation is served from it
    assert(DedupOps.lshLiveGenerations(spark, dir) === 4) // the 4 epochs
    // the replayed trigger must NOT early-return on the torn dir — it
    // rebuilds every leaf and only then commits
    DedupOps.compactLshEpochs(spark, dir, 2)
    assert(DedupOps.lshLiveGenerations(spark, dir) === 2) // compact=2 + epoch=3
    assert(spark.read.parquet(s"$dir/compact=2/sets").count() > 0,
      "healed compaction must have rebuilt the missing leaf")
    assert(spark.read.parquet(s"$dir/compact=2/bands")
      .select("doc_id").distinct().count() === 3,
      "healed compaction must carry epochs 0-2, not the torn leftover")
  }

  test("s27 compaction primitive: replay-safe, watermark-keyed, bounded") {
    import spark.implicits._
    val dir = graft.TmpDirs.scratch("s27spec")
    // six fake epochs of band/set rows through the real fold
    (0L to 5L).foreach { e =>
      DedupOps.foldLshDeltaEpoch(
        Seq((100 + e, s"alpha beta gamma delta epsilon zeta eta theta doc$e word"))
          .toDF("doc_id", "text"), s"$dir/epoch=$e")
    }
    assert(DedupOps.lshLiveGenerations(spark, dir) === 6)
    DedupOps.compactLshEpochs(spark, dir, 2)
    // epochs 0-2 folded into compact=2; 3-5 still live
    assert(DedupOps.lshLiveGenerations(spark, dir) === 4)
    val afterFirst = spark.read.parquet(s"$dir/compact=2/bands").count()
    // a REPLAYED trigger is a no-op (no new epochs below the watermark)
    DedupOps.compactLshEpochs(spark, dir, 2)
    assert(spark.read.parquet(s"$dir/compact=2/bands").count() === afterFirst)
    assert(DedupOps.lshLiveGenerations(spark, dir) === 4)
    // the next tick folds prior compact + epochs 3-5 into compact=5
    DedupOps.compactLshEpochs(spark, dir, 5)
    assert(DedupOps.lshLiveGenerations(spark, dir) === 1)
    // nothing lost across two compactions: 6 docs × 8 bands
    assert(spark.read.parquet(s"$dir/compact=5/bands")
      .select("doc_id").distinct().count() === 6)
  }

  test("d9: delta fold never touches the base LSH index; serve equals monolithic pairs") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val d = "/root/testdata/sf0.01"
    DedupOps.ensureLshIndexBase(spark, d)
    def snapshot(sub: String): Map[String, java.nio.file.attribute.FileTime] = {
      val p = Paths.get(DedupOps.lshWarehousePath, sub)
      Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    }
    val baseBands = snapshot("bands_base")
    val baseSets = snapshot("sets_base")
    assert(baseBands.nonEmpty && baseSets.nonEmpty)
    DedupOps.foldLshDelta(spark, d)
    assert(snapshot("bands_base") == baseBands,
      "delta fold must not rewrite the base band index")
    assert(snapshot("sets_base") == baseSets,
      "delta fold must not rewrite the base shingle sets")
    assert(snapshot("bands_delta").nonEmpty)
    // serving the incremental question from the persisted index
    // equals the MONOLITHIC operator restricted to delta-crossing
    // pairs — one missing index row anywhere would break this
    val served = DedupOps.lshServeDelta(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mono = DedupOps.minhashPairs(graft.Tables.documents(spark, d))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => p._1 % 4 == 3 || p._2 % 4 == 3).toSet
    assert(served == mono)
    assert(served.nonEmpty, "fixture must exercise delta-crossing pairs")
    // re-fold on the same corpus is a no-op (idempotent per batch)
    val deltaBefore = snapshot("bands_delta")
    DedupOps.foldLshDelta(spark, d)
    assert(snapshot("bands_delta") == deltaBefore)
  }

  test("s26: stream-maintained LSH index serves the batch answer; epoch replay idempotent") {
    import spark.implicits._
    // stream == batch: the epoch-accumulated index must answer the
    // incremental near-dup question identically to d9's one-shot fold
    val d = "/root/testdata/sf0.01"
    DedupOps.ensureLshIndexBase(spark, d)
    DedupOps.foldLshDelta(spark, d)
    val batch = DedupOps.lshServeDelta(spark)
      .collect().map(_.toSeq).toSeq
    val streamed = DedupOps.lshIndexStreamServe(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // epoch replay: same batch re-folded into the same epoch dir
    // leaves identical rows (the c11 overwrite recipe)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s26_spec").toString + "/epoch=0"
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    DedupOps.foldLshDeltaEpoch(docs, dir)
    val first = spark.read.parquet(s"$dir/bands")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    DedupOps.foldLshDeltaEpoch(docs, dir)
    val second = spark.read.parquet(s"$dir/bands")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(second == first)
    assert(spark.read.parquet(s"$dir/sets").count() == 2)
  }

  test("s25: an epoch replay overwrites its own delta generation (exactly-once)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s25_spec").toString + "/epoch=0"
    val batch = Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    SimilarityOps.foldAnnDeltaEpoch(batch, dir, nBands = 2, bandBits = 2)
    val first = spark.read.parquet(s"$dir/bands")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // the replay case c11's recipe exists for: same epoch, same batch,
    // written again after a simulated failure — no duplicates
    SimilarityOps.foldAnnDeltaEpoch(batch, dir, nBands = 2, bandBits = 2)
    val second = spark.read.parquet(s"$dir/bands")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(second == first)
    assert(spark.read.parquet(s"$dir/vecs").count() == 2)
  }

  test("d7 semantic dedup: assignments parallelism-independent; duplicates collapse") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
    def assign(df: org.apache.spark.sql.DataFrame) =
      DedupOps.semanticAssignments(df).select("vec_id", "cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(assign(emb.repartition(3)) == assign(emb.repartition(17)))
    // planted: ids 1/2 identical vectors (cosine 1), 3 orthogonal —
    // the survivor set must drop exactly the higher duplicate id
    val v1 = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val v3 = Array.tabulate(8)(i => if (i == 7) 1f else 0f)
    val planted = Seq((1L, v1), (2L, v1.clone()), (3L, v3))
      .toDF("vec_id", "embedding")
    val survivors = DedupOps.semanticDedupSurvivors(
        DedupOps.semanticAssignments(planted, k = 2))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L), s"survivors=$survivors")
  }

  test("GraftExtensions injects cosine_sim at session build time") {
    // force a genuinely NEW session (getOrCreate would return the
    // suite's session and skip extension application); the context is
    // shared, so the extra session is abandoned, never stopped
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      // built WITH extensions: SQL sees the function without any
      // runtime register() call
      val r = s2.sql(
        "SELECT round(cosine_sim(array(1D,0D), array(1D,0D)), 5) AS s")
        .collect()(0).getDouble(0)
      assert(r == 1.0)
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("shingleHashes: sorted distinct, equals SQL xxhash64 of shingles") {
    import spark.implicits._
    val text = "a b c d a b c x y"
    val hs = graft.functions.HashOps.shingleHashes(text, 3)
    // sorted + distinct
    assert(hs.toSeq == hs.toSeq.sorted && hs.toSeq.distinct == hs.toSeq)
    // matches the Catalyst form hash-for-hash (same xxhash64 seed 42)
    val sqlHashes = Seq(text).toDF("text")
      .selectExpr("explode(transform(sequence(0, size(split(text,' '))-3), " +
        "i -> xxhash64(concat_ws(' ', split(text,' ')[i], " +
        "split(text,' ')[i+1], split(text,' ')[i+2])))) AS h")
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(hs.toSeq == sqlHashes)
    // degenerate inputs
    assert(graft.functions.HashOps.shingleHashes("a b", 3).isEmpty)
    assert(graft.functions.HashOps.shingleHashes("", 3).isEmpty)
  }

  test("prefixLen08 matches the set-similarity bound c - ceil(0.8c) + 1") {
    for (c <- 1 to 500)
      assert(graft.functions.HashOps.prefixLen08(c) ==
        c - math.ceil(0.8 * c).toInt + 1, s"c=$c")
  }

  test("minhashSigFromHashes: permutation-min property and stability") {
    val a = Array(1L, 5L, 9L, 13L)
    val sig = graft.functions.HashOps.minhashSigFromHashes(a, 8)
    // signature of a superset is elementwise <= (min over more items)
    val sup = graft.functions.HashOps.minhashSigFromHashes(a :+ 21L, 8)
    assert(sig.zip(sup).forall { case (s, t) => t <= s })
    // order-independent
    val shuf = graft.functions.HashOps.minhashSigFromHashes(
      Array(13L, 1L, 9L, 5L), 8)
    assert(sig.toSeq == shuf.toSeq)
  }

  test("t8 decontaminate: planted overlap flags exactly the shared-run docs") {
    import spark.implicits._
    val run = (30 to 45).map(i => s"w$i").mkString(" ") // 16 shared tokens
    val evalDf = Seq((100L, s"preface $run trailer")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"a b c $run x y z"), // contains the run
      (2L, (1 to 40).map(i => s"u$i").mkString(" ")), // clean
      (3L, "w30 w31 w32 w33 w34 w35 w36") // 7-token fragment of the run
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(train, evalDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // only doc 1; its 16 shared tokens hold 16-8+1 distinct 8-shingles.
    // doc 3 is UNDER the shingle width → by contract never flagged...
    assert(out == Map(1L -> 9L))
    // ...until the width drops below its length: at n=4 its 7 tokens
    // hold 4 shared windows.
    val n4 = TextAnalysis.decontaminate(train, evalDf, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(n4(3L) == 4L && n4(1L) == 13L && !n4.contains(2L))
  }

  test("t1/t2 run at sf0.001 and return one row per document") {
    for (name <- Seq("t1_token_counts", "t2_quality_score")) {
      val df = TextAnalysis.defs.find(_.name == name).get
        .fn(spark, "/root/testdata/sf0.001")
      assert(df.count() == 500, name)
    }
  }

  test("t9 repetition metrics: hand-computed counts; planted boilerplate flags") {
    import spark.implicits._
    // doc 1: "a b a b a b" — bigrams [ab,ba,ab,ba,ab]: n=5, top "a b"=3;
    //   trigrams [aba,bab,aba,bab]: n=4, all duplicated → dup=4.
    //   3*100 > 5*6 → flagged.
    // doc 2: 30 all-distinct tokens — top bigram 1/29, no dup
    //   trigrams, 1*100 > 29*6 false → clean (the 0.06 cut assumes
    //   corpus-length docs: any doc under 17 tokens flags trivially).
    // doc 3: 2 tokens — no trigram slots → excluded (oracle inner join).
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (3L, "x y")).toDF("doc_id", "text")
    val byId = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId.keySet == Set(1L, 2L))
    val d1 = byId(1L)
    assert(d1.getLong(1) == 5 && d1.getLong(2) == 3 && d1.getLong(4) == 4
      && d1.getLong(5) == 4 && d1.getBoolean(7))
    assert(d1.getDouble(3) == 0.6 && d1.getDouble(6) == 1.0)
    val d2 = byId(2L)
    assert(d2.getLong(2) == 1 && d2.getLong(5) == 0 && !d2.getBoolean(7))
  }

  test("d5b quality survivors: longest cluster member wins, not min id") {
    import spark.implicits._
    // Cluster {1,2,3}: doc 3 is longest → survives; d5's min-id rule
    // would keep doc 1. Doc 9 unclustered → survives. Tie in cluster
    // {5,6}: equal lengths → min id 5.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e"),
      (5L, "x y"), (6L, "p q"), (9L, "lone doc")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val got = DedupOps.qualitySurvivors(docs, clusters)
      .as[Long].collect().toSet
    assert(got == Set(3L, 5L, 9L))
  }

  test("l6 span dedup: later verbatim spans drop, partial tails compare, full dups empty") {
    import spark.implicits._
    // k=4 spans. Doc 1: spans ["a b c d", "e f g h", "tail x"].
    // Doc 2 repeats doc 1's first span at its OWN first slot (drops),
    // keeps a unique second span. Doc 3 is a verbatim copy of doc 1 →
    // every span drops → clean_text empty. Doc 4's only span is a
    // 2-token partial equal to doc 1's tail → drops (partial spans
    // dedup too). Within-doc repeats also drop (doc 5 repeats its own
    // first span).
    val docs = Seq(
      (1L, "a b c d e f g h tail x"),
      (2L, "a b c d own span here q"),
      (3L, "a b c d e f g h tail x"),
      (4L, "tail x"),
      (5L, "p q r s p q r s")).toDF("doc_id", "text")
    val got = TextOps.spanDedup(docs, 4)
      .select("doc_id", "n_spans", "n_dropped", "clean_text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((3L, 0L, "a b c d e f g h tail x")))
    assert(got(2L) == ((2L, 1L, "own span here q")))
    assert(got(3L) == ((3L, 3L, "")))
    assert(got(4L) == ((1L, 1L, "")))
    assert(got(5L) == ((2L, 1L, "p q r s")))
  }

  test("l6 span dedup: randomized differential vs in-memory reference") {
    import spark.implicits._
    // Generated corpora with planted duplication shapes the fixture
    // never hits densely: verbatim doc copies, shared prefixes (span-
    // aligned overlap), tiny docs shorter than one span, within-doc
    // span repeats. The Spark op must equal a plain-Scala reference
    // on every (doc, n_spans, n_dropped, clean_text) cell.
    def reference(docs: Seq[(Long, String)], k: Int)
        : Map[Long, (Long, Long, String)] = {
      val firstPos = scala.collection.mutable.Map[String, Long]()
      val spans = docs.sortBy(_._1).flatMap { case (id, text) =>
        val ts = text.split(' ')
        Iterator.tabulate((ts.length + k - 1) / k) { i =>
          (id, i, ts.slice(i * k, math.min((i + 1) * k, ts.length)).mkString(" "))
        }
      }
      spans.foreach { case (id, ci, sp) =>
        val pos = id * 1000000L + ci
        if (!firstPos.contains(sp) || firstPos(sp) > pos) firstPos(sp) = pos
      }
      spans.groupBy(_._1).map { case (id, ss) =>
        val kept = ss.filter { case (i, ci, sp) => firstPos(sp) == i * 1000000L + ci }
        (id, (ss.size.toLong, (ss.size - kept.size).toLong,
          kept.sortBy(_._2).map(_._3).mkString(" ")))
      }
    }
    for (seed <- Seq(11L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(12)(i => s"v$i")
      def mk(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val base = (0L until 30L).map(i => (i, mk(2 + rnd.nextInt(30))))
      val copies = (30L until 40L).map(i => (i, base(rnd.nextInt(30))._2))
      val prefixed = (40L until 46L).map { i =>
        val donor = base(rnd.nextInt(30))._2.split(' ')
        (i, (donor.take(8) ++ Array.fill(5)(vocab(rnd.nextInt(vocab.length)))).mkString(" "))
      }
      val docs = rnd.shuffle(base ++ copies ++ prefixed)
      val got = TextOps.spanDedup(docs.toDF("doc_id", "text"), 4)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == reference(docs, 4), s"seed=$seed")
    }
  }

  test("p2 pipeline: fused kernel gates equal the naive declarative nesting") {
    import org.apache.spark.sql.expressions.Window
    // Naive composition in the oracle-CTE order: dedup FIRST, then
    // the declarative quality gates, then the t9 repetition gate via
    // repetitionStats + semi join, then decontamination on the clean
    // stream. p2's fused typed kernel (one tokenize pass for every
    // gate, run BELOW the window) must not change a single manifest
    // cell.
    val docs = graft.Tables.documents(spark, sf)
    val toks = split(col("text"), " ")
    val dedup = docs.filter(col("source") =!= "src1")
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
    val qual = dedup
      .withColumn("n_tok", size(toks).cast("long"))
      .filter(col("n_tok") >= 24 &&
        size(array_distinct(toks)) * 10 >= size(toks) * 3)
      .select("doc_id", "source", "text", "n_tok")
    val unflagged = TextAnalysis.repetitionStats(qual)
      .filter(!col("flagged")).select("doc_id")
    val clean0 = qual.join(unflagged, Seq("doc_id"), "left_semi")
    val evalSlice = docs.filter(col("source") === "src1")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val cont = TextAnalysis.decontaminate(
      clean0.select(col("doc_id"), lower(col("text")).as("text")), evalSlice)
      .select("doc_id")
    val mix = pmod(col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L))
    val naive = clean0.join(broadcast(cont), Seq("doc_id"), "left_anti")
      .filter(pmod(col("doc_id"), lit(100)) <
        when(col("source").isin("src0", "src1", "src2", "src3", "src4", "src5"), 25)
          .when(col("source").isin("src6", "src7", "src8", "src9", "src10", "src11"), 50)
          .otherwise(100))
      .withColumn("split",
        when(mix < 800, "train").when(mix < 900, "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val p2 = CorpusPipeline.defs.find(_.name == "p2_manifest_pipeline").get
      .fn(spark, sf)
    val got = p2.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == naive, s"rewritten=${got.size} naive=${naive.size}")
    // Plan property: exactly ONE logical Window — the keep-first
    // dedup; the fused gates must not have introduced a second
    // window-bearing subtree inside the broadcast build side.
    val windows = p2.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 1, s"expected 1 logical Window, got ${windows.size}")
  }

  test("p1 pipeline: rewrites equal the naive nesting; ONE window shuffle") {
    import org.apache.spark.sql.expressions.Window
    // Naive composition in the oracle-CTE order: dedup FIRST, gates
    // after the window, contamination probed on the deduped+gated
    // stream. p1's scale rewrites (gates below the window; probe on
    // the gated raw slice) must not change a single output row.
    val docs = graft.Tables.documents(spark, sf)
    val toks = split(col("text"), " ")
    val naiveQual = docs.filter(col("source") =!= "src1")
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("ttr", size(array_distinct(toks)) * lit(1.0) / size(toks))
      .filter(col("n_tok") >= 24 && col("ttr") >= 0.30)
      .select(col("doc_id"), col("source"),
        lower(col("text")).as("text"), col("n_tok"))
    val evalSlice = docs.filter(col("source") === "src1")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val naiveCont = TextAnalysis
      .decontaminate(naiveQual.select("doc_id", "text"), evalSlice)
      .select("doc_id")
    val naive = naiveQual
      .join(broadcast(naiveCont), Seq("doc_id"), "left_anti")
      .filter(pmod(col("doc_id"), lit(100)) <
        when(col("source").isin("src0", "src1", "src2", "src3", "src4", "src5"), 25)
          .when(col("source").isin("src6", "src7", "src8", "src9", "src10", "src11"), 50)
          .otherwise(100))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val p1 = CorpusPipeline.defs.find(_.name == "p1_preprocess_pipeline").get
      .fn(spark, sf)
    val got = p1.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, s"rewritten=${got.size} naive=${naive.size}")
    // Plan property: the dedup window runs ONCE — a second Window
    // node means Catalyst recomputed the keep-first subtree inside
    // the contamination broadcast build side. (Counted on the
    // optimized LOGICAL plan: under AQE the executed plan is an
    // adaptive wrapper whose physical tree isn't final yet.)
    val windows = p1.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 1, s"expected 1 logical Window, got ${windows.size}")
  }

  test("t8b fuzzy decontamination flags near-verbatim, not exact-only or clean") {
    import spark.implicits._
    val base = (1 to 400).map(i => s"tok$i").mkString(" ")
    // train 1: verbatim copy of eval 100 (exact contamination, j=1);
    // train 2: one-token edit of eval 100 — exact 8-gram check (t8
    // family) would still flag it, but the point here is Jaccard
    // 397/403 ≈ 0.985 ≥ 0.8 via a DIFFERENT surface than equality;
    // train 3: unrelated
    val train = Seq(
      (1L, base),
      (2L, base.replace("tok200 ", "tok200x ")),
      (3L, (500 to 900).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
    val eval = Seq((100L, base)).toDF("doc_id", "text")
    val got = DedupOps.fuzzyDecontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == (1L, 1.0))
    val (m2, j2) = got(2L)
    assert(m2 == 1L && j2 >= 0.97 && j2 < 1.0, s"got $j2")
  }

  test("d6 bloom delta dedup: exact vs base, keep-first, FP-heavy bloom still exact") {
    import spark.implicits._
    val base = Seq("a", "b", "c").toDF("k")
    val delta = Seq((1L, "a"), (2L, "d"), (3L, "d"), (4L, "e"), (5L, "b"))
      .toDF("id", "k")
    def run(items: Long, fpp: Double) =
      DedupOps.bloomDeltaDedup(base, delta, "k", "id", items, fpp)
        .select("id", "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = Set((2L, "d"), (4L, "e"))
    assert(run(1L << 16, 0.03) == expected)
    // an undersized, high-fpp bloom floods the candidate path with
    // false positives — the exact confirmation must absorb them all
    assert(run(1L, 0.5) == expected)
  }

  test("d6 bloom delta dedup: randomized differential vs in-memory reference") {
    import spark.implicits._
    // The operator is exact regardless of Bloom sizing; random
    // base/delta key mixes at both a sane and a deliberately
    // FP-flooded configuration must equal the plain set-difference +
    // keep-first reference.
    for (seed <- Seq(2L, 19L)) {
      val rnd = new scala.util.Random(seed)
      val keys = Array.tabulate(40)(i => s"k$i")
      val baseKeys = Array.fill(25)(keys(rnd.nextInt(keys.length))).distinct.toSeq
      val delta = (1L to 60L).map(id => (id, keys(rnd.nextInt(keys.length))))
      val expected = delta
        .filterNot { case (_, k) => baseKeys.contains(k) }
        .groupBy(_._2).map { case (k, rows) => (rows.map(_._1).min, k) }
        .toSet
      for ((items, fpp) <- Seq((1L << 16, 0.03), (1L, 0.5))) {
        val got = DedupOps.bloomDeltaDedup(
            baseKeys.toDF("k"), delta.toDF("id", "k"), "k", "id", items, fpp)
          .select("id", "k")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got == expected, s"seed=$seed items=$items fpp=$fpp")
      }
    }
  }

  test("a5 int8 quantization equals scalar double math on the raw embeddings") {
    val raw = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dims = raw.head._2.length
    val mn = Array.fill(dims)(Double.MaxValue)
    val mx = Array.fill(dims)(Double.MinValue)
    for ((_, e) <- raw; i <- 0 until dims) {
      val x = e(i).toDouble
      if (x < mn(i)) mn(i) = x
      if (x > mx(i)) mx(i) = x
    }
    val expected = raw.map { case (id, e) =>
      var sum = 0L; var lo = 0L; var hi = 0L
      for (i <- 0 until dims) {
        val c =
          if (mx(i) > mn(i))
            math.floor((e(i).toDouble - mn(i)) * 255.0 / (mx(i) - mn(i))).toLong
          else 0L
        sum += c
        if (c == 0L) lo += 1
        if (c == 255L) hi += 1
      }
      id -> ((sum, lo, hi))
    }.toMap
    val got = SimilarityOps.defs.find(_.name == "a5_quantize_int8").get
      .fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // quantization actually uses the full code range somewhere
    assert(got.values.exists(_._3 > 0))
  }

  test("m5 phash pairs equal naive dHash all-pairs on planted rasters") {
    import spark.implicits._
    // Differential vs an in-spec dHash reference over raw rasters:
    // random 16×16 images, exact copies (d=0), single-sampled-pixel
    // nudges (nearest-neighbor cells sample distinct pixels, so one
    // edit flips ≤2 gradient bits), and a stub-kind row the kind
    // filter must drop.
    def dhash(px: Array[Byte]): Long = {
      val p = px.map(_ & 0xFF)
      val r = Array.tabulate(72)(i => p((i / 9) * 2 * 16 + (i % 9) * 16 / 9))
      var h = 0L
      for (b <- 0 until 64)
        if (r((b / 8) * 9 + b % 8) > r((b / 8) * 9 + b % 8 + 1)) h |= 1L << b
      h
    }
    val rnd = new scala.util.Random(13)
    val rasters = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var id = 0L
    for (k <- 1 to 8) {
      val base = Array.fill(256)(rnd.nextInt(256).toByte)
      rasters += ((id, base)); id += 1
      if (k % 3 == 0) { rasters += ((id, base.clone())); id += 1 } // d = 0
      if (k % 3 == 1) { // nudge one sampled pixel: d <= 2
        val c = base.clone()
        val cell = rnd.nextInt(72)
        val px = (cell / 9) * 2 * 16 + (cell % 9) * 16 / 9
        c(px) = (c(px) + 90).toByte
        rasters += ((id, c)); id += 1
      }
    }
    val expected = (for {
      (ia, a) <- rasters; (ib, b) <- rasters if ia < ib
      d = java.lang.Long.bitCount(dhash(a) ^ dhash(b)) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(expected.exists(_._3 == 0) && expected.exists(_._3 > 0))
    val media = rasters.toSeq.map { case (i, px) =>
      (i, MultimodalOps.encodeGrayPng(px, 16, 16),
        MultimodalOps.MediaMeta(0, 16, 16, 256))
    } :+ ((999L, Array[Byte](1, 2, 3), MultimodalOps.MediaMeta(1, 64, 64, 3)))
    val got = MultimodalOps.phashPairs(media.toDF("media_id", "payload", "meta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("w1 bucketed join runs exchange-free; w2 scan has partition filters") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force SMJ so the bucketed layout (not a broadcast) must carry
      // the join, and read the non-adaptive executed plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      StorageOps.ensureBucketed(spark, sf)
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
      val bucketed = StorageOps.bucketedJoinFrame(spark)
      // the one exchange is the final groupBy (its key differs from
      // the bucket key); the JOIN itself reads co-located buckets
      assert(exchanges(bucketed) == 1,
        s"bucketed plan:\n${bucketed.queryExecution.executedPlan}")
      val raw = graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_items"))
      assert(exchanges(raw) == 3) // two join shuffles + the aggregate
      // layout must never change the answer
      val a = bucketed.collect().map(_.toSeq).toSet
      val b = graft.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .join(graft.Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("revenue"),
          round(sum("l_quantity"), 2).as("qty"))
        .collect().map(_.toSeq).toSet
      assert(a == b)
      // w2: the event_type predicate must resolve to PARTITION pruning
      val pruned = spark.read.parquet(StorageOps.ensurePartitioned(spark, sf))
        .filter(col("event_type") === "click")
      val scans = pruned.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
        s"pruned plan:\n${pruned.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("w8 DPP: fact scan carries a dynamic pruning filter, same answer") {
    val df = StorageOps.dppJoinFrame(spark, sf)
    // the date-partitioned fact scan must carry a DYNAMIC pruning
    // predicate (runtime subquery on the dim's selected dates) — there
    // is no static filter on event_date anywhere in the query. The
    // scan lives inside AdaptiveSparkPlanExec (collect doesn't descend
    // into AQE's inner plan), so assert on the rendered tree, where
    // PartitionFilters are printed on the warehouse fact scan.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression") &&
        plan.contains("events_dp"),
      s"no DynamicPruning on the fact scan:\n$plan")
    // the rule changes I/O, never the answer
    val raw = graft.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("event_date"), col("value"))
      .filter(dayofmonth(col("event_date")) % 7 === 0)
      .groupBy("event_date")
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
    assert(df.collect().map(_.toSeq).toSet == raw.collect().map(_.toSeq).toSet)
  }

  test("i7 nested parquet: schema pruning pushes one struct subfield to the scan") {
    val path = SourceOps.ensureNested(spark, sf)
    val df = spark.read.parquet(path).select(col("meta.lang"))
    val read = "ReadSchema: (\\S+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1)).getOrElse("")
    // nested pruning: the scan decodes meta.lang ONLY — neither the
    // sibling struct fields nor the token list
    assert(read.contains("lang:string") && !read.contains("n_chars") &&
      !read.contains("head_tokens"), read)
  }

  test("AQE splits a planted skewed join partition at runtime") {
    import spark.implicits._
    // the engine's declared skew story is two-layer: deterministic
    // salting where the quadratic OUTPUT of one key is the problem
    // (d1b), and AQE skew-join where one INPUT partition is the
    // problem — this pins the second layer actually firing.
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // test-scale thresholds: the hot key's ~2 MB partition must read
      // as skewed next to the ~KB tail partitions
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // 100k fat rows on key 0, ~2 on each of ~100k tail keys (1-based
      // so the tail never collides with the hot key). Payloads must be
      // VARIED: a constant pad lz4-compresses to nothing in the
      // shuffle and the hot partition never crosses the byte threshold
      val left = (0 until 300000)
        .map(i => (if (i % 3 == 0) 0L else (i % 99999).toLong + 1,
          f"payload-$i-${i * 2654435761L}%096d"))
        .toDF("k", "v").repartition(8)
      val right = (0L until 100000L).map(k => (k, s"p$k")).toDF("k", "p")
      // global aggregate downstream: no required distribution on k, so
      // AQE is FREE to split the skewed partition (a groupBy on the
      // join key would suppress the split — splitting breaks the
      // hashpartitioning the aggregate requires, and AQE correctly
      // refuses unless forced)
      val g = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("v"))).as("chars"))
      val row = g.collect()(0)
      assert(row.getLong(0) == 300000L) // splitting: no dup, no loss
      val plan = g.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(4000))
      // per-key correctness through the same join shape (its own plan
      // keeps the partitioning, so this frame is the unsplit control)
      val hot = left.join(right, "k").filter(col("k") === 0)
        .groupBy("k").agg(count(lit(1)).as("n"), max("p").as("p"))
        .collect()(0)
      assert(hot.getLong(1) == 100000L && hot.getString(2) == "p0")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("w9 CBO: stats reorder the join — fact leaves the innermost join") {
    StorageOps.ensureAnalyzed(spark, sf)
    def innermostTables(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      // the LAST collected join is the deepest (collect is pre-order);
      // its leaf relations are the first two tables joined
      joins.last.collectLeaves().map(_.toString).flatMap { s =>
        Seq("graft_li_s", "graft_ord_s", "graft_cust_s").filter(s.contains)
      }.toSet
    }
    // syntactic order: lineitem joins first
    assert(innermostTables(StorageOps.cboFrame(spark)) == Set("graft_li_s", "graft_ord_s"))
    // CBO + stats: the optimizer joins orders to the FILTERED customer
    // first and saves the big table for last
    val reordered = StorageOps.withCbo(spark) {
      innermostTables(StorageOps.cboFrame(spark))
    }
    assert(reordered == Set("graft_ord_s", "graft_cust_s"),
      s"CBO did not reorder: innermost = $reordered")
    // stats change plans, never answers
    val a = StorageOps.withCbo(spark) { StorageOps.cboFrame(spark).collect().toSet }
    assert(a == StorageOps.cboFrame(spark).collect().toSet)
  }

  test("w7 row-group layout: one file, many groups, multi-partition scan, same answer") {
    import scala.jdk.CollectionConverters._
    // sf0.01: enough rows that the 1 MB in-memory block bound yields
    // many groups (sf0.001's whole table fits ~2 blocks)
    val sfW7 = "/root/testdata/sf0.01"
    val path = StorageOps.ensureRowGrouped(spark, sfW7)
    // footer: exactly ONE data file whose row groups are many and small
    val files = new java.io.File(path).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, s"expected one file, got ${files.length}")
    val conf = spark.sessionState.newHadoopConf()
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head.getAbsolutePath), conf))
    val nGroups = try rdr.getFooter.getBlocks.asScala.size finally rdr.close()
    assert(nGroups >= 8, s"expected >=8 row groups, got $nGroups")
    // the single file decodes as MULTIPLE non-empty scan partitions —
    // the intra-file parallelism a single-group file cannot have
    // (splits are byte ranges; only row-group boundaries make them
    // non-empty). Pin a small maxPartitionBytes so the split math is
    // deterministic under the shared-JVM session.
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (256L << 10).toString)
    try {
      val perPart = spark.read.parquet(path)
        .mapPartitions(it => Iterator.single(it.size))(
          org.apache.spark.sql.Encoders.scalaInt)
        .collect()
      assert(perPart.count(_ > 0) > 1,
        s"single-task scan despite row groups: ${perPart.toSeq}")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    // layout must not change the answer
    val a = spark.read.parquet(path)
      .agg(count(lit(1)), round(sum("l_quantity"), 2)).collect().head
    val b = graft.Tables.lineitem(spark, sfW7)
      .agg(count(lit(1)), round(sum("l_quantity"), 2)).collect().head
    assert(a == b)
  }

  test("w3 sorted layout: ts filter pushed to scan; row-group zones cover the window tightly") {
    import scala.jdk.CollectionConverters._
    val path = StorageOps.ensureSorted(spark, sf)
    def utcMicros(s: String): Long = java.time.LocalDateTime
      .parse(s).toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val (loU, hiU) = (utcMicros("2024-01-15T00:00:00"), utcMicros("2024-01-16T00:00:00"))
    // the range predicate must reach the parquet scan (PushedFilters)
    val q = spark.read.parquet(path)
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.head.metadata("PushedFilters").contains("ts"),
      s"plan:\n${q.queryExecution.executedPlan}")
    // footer audit: sorted write ⇒ many row groups with tight disjoint
    // ts zones, and only ~window/span of them intersect the predicate
    val conf = spark.sessionState.newHadoopConf()
    var total = 0; var hit = 0
    for (f <- new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet"))) {
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        for (b <- rdr.getFooter.getBlocks.asScala) {
          total += 1
          val c = b.getColumns.asScala.find(_.getPath.toDotString == "ts").get
          val st = c.getStatistics
          val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
          val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
          if (mx >= loU && mn < hiU) hit += 1
        }
      } finally rdr.close()
    }
    assert(total >= 16, s"expected many small row groups, got $total")
    // 1-day window over a 30-day corpus: a sorted layout confines the
    // window to a few groups; an unsorted one would intersect ~all
    assert(hit.toDouble / total <= 0.25, s"hit=$hit total=$total")
    // layout must not change the answer
    val a = q.agg(count(lit(1)), round(sum("value"), 2)).collect().head
    val b = graft.Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
      .agg(count(lit(1)), round(sum("value"), 2)).collect().head
    assert(a == b)
  }

  test("d10 cluster sizes: doc mass conserved; singletons fill the size-1 bin") {
    val rows = DedupOps.defs.find(_.name == "d10_cluster_sizes").get
      .fn(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (sz, n, docs) => docs == sz * n })
    assert(rows.map(_._3).sum == graft.Tables.documents(spark, sf).count())
    // clusters come from pairs → every non-singleton bin has size ≥ 2,
    // and the corpus's planted near-dups guarantee at least one
    assert(rows.exists { case (sz, n, _) => sz >= 2 && n > 0 })
  }

  test("late-r9 plan shapes: q29 melts in one Expand over one scan; q30 one exchange; q31 one window") {
    import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    // static plans: an AdaptiveSparkPlanExec wrapper hides its inner
    // tree from collect() until execution
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    def planOf(name: String) = Relational.defs.find(_.name == name).get
      .fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
    try {
    // q29: the melt must be ONE Expand inside ONE scan's stage — a
    // union-of-four-projections rewrite would re-read the fact table
    // once per measure
    val q29 = planOf("q29_unpivot")
    assert(q29.collect { case e: ExpandExec => e }.size == 1, q29)
    assert(q29.collect { case s: FileSourceScanExec => s }.size == 1, q29)
    // q30: percentile aggregates ride one map-side-combined exchange
    val q30 = planOf("q30_percentile")
    assert(q30.collect { case e: ShuffleExchangeLike => e }.size == 1, q30)
    // q31: all three distribution functions share ONE window operator
    // (one sort+exchange), plus only the output range sort
    val q31 = planOf("q31_window_distribution")
    assert(q31.collect { case w: WindowExec => w }.size == 1, q31)
    assert(q31.collect { case e: ShuffleExchangeLike => e }.size <= 2, q31)
    } finally spark.conf.set(aqeKey, aqePrev)
  }

  test("p5 rendezvous sharding: minimal disruption (movers land ONLY on the new shard), balance") {
    val rows = CorpusPipeline.defs.find(_.name == "p5_rendezvous_shards").get
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // THE HRW property: growing 8 → 9 shards never moves a doc
    // between surviving shards — every mover's new home is shard 8
    val movers = rows.filter(_._4)
    assert(movers.nonEmpty && movers.forall(_._3 == 8),
      s"${movers.count(_._3 != 8)} docs moved between surviving shards")
    // ...and the stable docs keep their shard verbatim
    assert(rows.filterNot(_._4).forall(r => r._2 == r._3))
    // moved fraction ≈ 1/9 (wide band: small corpus)
    val frac = movers.length.toDouble / rows.length
    assert(frac > 0.03 && frac < 0.25, s"moved fraction $frac")
    // balance: no shard holds more than 3× the ideal 1/8 share
    val byShard = rows.groupBy(_._2).map(_._2.size)
    assert(byShard.size == 8 && byShard.max <= rows.length * 3 / 8,
      s"imbalanced: $byShard")
    // deterministic
    val again = CorpusPipeline.defs.find(_.name == "p5_rendezvous_shards").get
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("t22 bigram coverage: planted known/unknown bigrams; conservation on the corpus") {
    import spark.implicits._
    // planted: train docs (ids 1,2) establish bigrams; eval doc 10
    // repeats a known bigram twice and carries one unknown bigram
    val docs = Seq(
      (1L, "alpha beta gamma"), // train: {alpha beta, beta gamma}
      (2L, "beta gamma delta"), // train: {beta gamma, gamma delta}
      (10L, "alpha beta alpha beta zz7"), // eval
      (20L, ""), // eval: 1 empty token, 0 bigrams
      (30L, "solo")) // eval: 1 token, 0 bigrams
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramCoverage(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 10 bigrams: "alpha beta"(known), "beta alpha"(unknown),
    // "alpha beta"(known again — multiplicity counts), "beta zz7"(unknown)
    assert(got == Map(10L -> ((5L, 4L, 2L)), 20L -> ((1L, 0L, 0L)),
      30L -> ((1L, 0L, 0L))), got.toString)
    // corpus conservation: n_known <= n_bigrams = n_tok - 1, and the
    // tiny-vocab corpus overlaps heavily (coverage mostly > 0)
    val corpus = TextAnalysis.bigramCoverage(
      graft.Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(corpus.nonEmpty)
    assert(corpus.forall { case (nt, nb, nk) => nb == nt - 1 && nk <= nb })
    assert(corpus.count(_._3 > 0) * 2 > corpus.length)
  }

  test("i6 schema merge: pre-evolution rows surface NULL props; generations partition by parity") {
    val i6 = SourceOps.defs.find(_.name == "i6_schema_merge").get
      .fn(spark, sf).collect()
    assert(i6.nonEmpty)
    // every type has pre-evolution rows, and they are exactly the
    // even-event_id half of that type's events
    val byType = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(when(col("event_id") % 2 === 0, 1)).as("evens"),
        count(lit(1)).as("all"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (r <- i6) {
      val (evens, all) = byType(r.getString(0))
      assert(r.getLong(1) == all, s"${r.getString(0)} count")
      assert(r.getLong(4) == evens, s"${r.getString(0)} pre-evolution rows")
    }
  }

  test("i11 JDBC source: 4-way partitioned read, round-trip equals the parquet slice") {
    SourceOps.ensureJdbc(spark, sf)
    val jdbc = SourceOps.readJdbcPartitioned(spark)
    // partitionColumn/bounds/numPartitions → 4 range-query tasks
    assert(jdbc.rdd.getNumPartitions == 4)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val direct = graft.Tables.events(spark, sf)
      .select("event_id", "event_type", "value", "props")
      .filter(col("event_id") < 2000)
    // write→store→read round trip loses nothing (CLOB props included)
    assert(canon(jdbc) == canon(direct))
    // partitioned ≡ unpartitioned: range predicates tile the table
    assert(canon(jdbc) == canon(SourceOps.readJdbcPartitioned(spark, 1)))
  }

  test("t21 accent folding: fold undoes the injected accents; raw docs unchanged") {
    val got = TextAnalysis.defs.find(_.name == "t21_fold_accents").get
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val raw = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length == raw.size)
    for ((id, folded, changed) <- got) {
      // the injection only accents fold-reversible chars, so folding
      // an even doc returns exactly the lowercased raw text
      assert(folded == raw(id).toLowerCase(java.util.Locale.ROOT), s"doc $id")
      if (id % 2 != 0) // odd docs were never accented: changed iff case-bearing
        assert(changed == (raw(id) != raw(id).toLowerCase(java.util.Locale.ROOT)))
    }
  }

  test("k3 count-of-counts: masses sum to the token stream; bins sum to the vocabulary") {
    val rows = TextAnalysis.defs.find(_.name == "k3_count_of_counts").get
      .fn(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall { case (c, n, m) => m == c * n })
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
    assert(rows.map(_._3).sum == toks.count())
    assert(rows.map(_._2).sum == toks.distinct().count())
  }

  test("s18 concurrency: hand-computed peaks; midnight crossing; half-open touch never overlaps") {
    import spark.implicits._
    val ev = Seq(
      // three overlapping intervals in hour 10: peak 3
      "2024-01-01 10:00:00", "2024-01-01 10:10:00", "2024-01-01 10:20:00",
      // half-open touch: starts exactly when the 10:20 interval ends
      // (10:50) — the -1 processes first, so hour-10 peak stays 3
      "2024-01-01 10:50:00",
      // crosses midnight: open 23:45-00:15 → hour 0 of Jan 2 sees it
      "2024-01-01 23:45:00",
      "2024-01-02 00:05:00") // overlaps the carried piece → peak 2
      .zipWithIndex.map { case (t, i) =>
        (i.toLong, java.sql.Timestamp.valueOf(t), 1L, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_s18_spec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.defs.find(_.name == "s18_concurrency").get
      .fn(spark, dir).collect()
      .map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2024-01-01 10:00:00.0")._1 == 3L) // overlap peak; touch does not bump it
    // hour 11 holds only the 10:50 interval's END point — the sweep
    // samples at change points, so its hourly max is the post-close 0
    assert(got("2024-01-01 11:00:00.0") == ((0L, 1L)))
    assert(got("2024-01-01 23:00:00.0")._1 == 1L)
    assert(got("2024-01-02 00:00:00.0")._1 == 2L) // carried piece + 00:05 interval
  }

  test("a8 filtered ANN: only predicate survivors appear; equals filtered brute force") {
    val emb = graft.Tables.embeddings(spark, sf)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = SimilarityOps.defs.find(_.name == "a8_filtered_ann").get
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 50) // 10 queries × k=5 — label-1 pool is large enough
    assert(got.forall { case (_, _, cid) => labels(cid) == 1 })
    // differential vs post-filtering a DEEP unfiltered top-k: the
    // filtered search's neighbor set equals the label-1 survivors of
    // exact ranking (computed via the unfiltered kernel at large k)
    val deep = graft.functions.VectorOps.annTopK(emb, nQueries = 10, k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wantTop = deep.groupBy(_._1).map { case (q, rows) =>
      q -> rows.sortBy(_._2).map(_._3).filter(labels(_) == 1).take(5).toSeq }
    val gotTop = got.groupBy(_._1).map { case (q, rows) =>
      q -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(gotTop == wantTop)
  }

  test("d8 edit-distance pairs: typo pairs found across band borders, each exactly once") {
    val base = "word" * 40 // 160 chars → band 10
    // planted: (1,2) same band, 1-char typo; (3,4) straddle a band
    // border (160 vs 166 chars → bands 10/10 vs 10/[after pad]);
    // (5) unrelated long doc
    val docs = Seq(
      (1L, base),
      (2L, base.updated(10, 'X').toString),
      (3L, base + " extra"), // 166 chars → band 10
      (4L, base + " extra padding!"), // 175 chars → band 10 — make it straddle:
      (5L, "z" * 200))
    // adjust doc 4 to land one band over (176+ chars → band 11)
    val docs2 = docs.updated(3, (4L, base + " extra padding xx")) // 177 chars
    import spark.implicits._
    val df = docs2.map { case (id, t) => (id, t, "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "source", "n_chars")
    // run the same plan as the entry over a temp frame: reproduce via
    // the entry's logic by writing a parquet dir Tables can read
    val dir = java.nio.file.Files.createTempDirectory("graft_d8_spec").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupOps.defs.find(_.name == "d8_edit_distance_pairs").get
      .fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val asMap = got.toMap
    assert(got.length == asMap.size, s"pair emitted twice: ${got.toSeq}") // exactly-once
    assert(asMap.get((1L, 2L)).contains(1L)) // 1-char typo
    assert(asMap.contains((3L, 4L))) // bands 10 vs 11: ±1 overlap catches it
    assert(!asMap.keys.exists(p => p._1 == 5L || p._2 == 5L)) // unrelated: no pair
  }

  test("q34 table profile: planted nulls/ndv/extrema/mode, deterministic tie-break") {
    import spark.implicits._
    // planted events twin: 2 nulls in value, ndv known per column,
    // event_type mode 'b' (3×) with a 2-2 runner-up tie broken by value
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 5L, "b", Option(1.5), "{}"),
      (2L, "2024-01-01 10:00:01", 5L, "b", Option(2.5), "{\"k\":1}"),
      (3L, "2024-01-01 10:00:02", 6L, "b", None, "{}"),
      (4L, "2024-01-01 10:00:03", 6L, "a", Option(1.5), "{}"),
      (5L, "2024-01-01 10:00:04", 7L, "a", None, "{\"k\":2}"),
      (6L, "2024-01-01 10:00:05", 7L, "c", Option(9.0), "{}"),
      (7L, "2024-01-01 10:00:06", 7L, "c", Option(-1.0), "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q34").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val prof = Relational.defs.find(_.name == "q34_table_profile").get
      .fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    val v = prof("value")
    assert(v.getLong(1) == 7 && v.getLong(2) == 2 && v.getLong(3) == 4) // n, nulls, ndv
    assert(v.getDouble(4) == -1.0 && v.getDouble(5) == 9.0)
    val et = prof("event_type")
    assert(et.getLong(3) == 3 && et.getString(6) == "a" && et.getString(7) == "c")
    assert(et.getString(8) == "b" && et.getLong(9) == 3) // mode 3×
    val pr = prof("props")
    // mode tie 4-"{}"... "{}" wins at 5 occurrences; check count
    assert(pr.getString(8) == "{}" && pr.getLong(9) == 5)
    val uid = prof("user_id")
    assert(uid.getLong(3) == 3 && uid.getDouble(4) == 5.0 && uid.getDouble(5) == 7.0)
  }

  test("t23 weighted sample: weight bias, exact k per source, layout independence") {
    import spark.implicits._
    // two weight classes under one source: w=2000 docs must dominate a
    // k=10 draw over w=20 docs (inclusion odds ∝ weight); plus a second
    // source proving per-source quotas
    val docs = (1 to 500).map { i =>
      val heavy = i % 2 == 0
      (i.toLong, "x", "en", if (i <= 400) "s1" else "s2",
        if (heavy) 2000L else 20L)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_t23").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val qd = TextAnalysis.defs.find(_.name == "t23_weighted_sample").get
    val got = qd.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.count(_._1 == "s1") == 10 && got.count(_._1 == "s2") == 10)
    // expected heavy fraction ≈ w_h/(w_h+w_l) ≈ 0.99 per draw; ≥ 8/10
    // heavy picks per source is a ~5σ-safe bound
    val heavyPicks = got.count(_._2 % 2 == 0)
    assert(heavyPicks >= 16, s"weights ignored: $heavyPicks/20 heavy")
    // deterministic under any partitioning (hash-derived keys)
    val again = qd.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("d8 segment blocking loses no pair: brute-force equivalence under adversarial edits") {
    // The r12 PassJoin pigeonhole (9 fixed segments, ±8-position
    // substring keys) is a NECESSARY condition for lev(prefix64) ≤ 8 —
    // stress it where it could break: exactly-8 edits spread across
    // distinct segments, edits at segment boundaries, leading
    // insertions/deletions (maximum position shift), and docs shorter
    // than the 64-char prefix (empty trailing segments).
    val rnd = new scala.util.Random(1234)
    def randDoc(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    def edit(s: String, k: Int): String = {
      var t = s
      for (_ <- 1 to k) {
        val p = rnd.nextInt(t.length.max(1))
        t = rnd.nextInt(3) match {
          case 0 if t.nonEmpty => t.take(p) + t.drop(p + 1) // delete
          case 1 => t.take(p) + ('a' + rnd.nextInt(6)).toChar + t.drop(p) // insert
          case _ if t.nonEmpty =>
            t.take(p) + ('a' + rnd.nextInt(6)).toChar + t.drop(p + 1) // subst
          case _ => t
        }
      }
      t
    }
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    for (baseLen <- Seq(30, 64, 100, 200); k <- Seq(1, 4, 8)) {
      val s0 = randDoc(baseLen)
      docs += ((id, s0)); id += 1
      docs += ((id, edit(s0, k))); id += 1
    }
    // leading-edge shifts: 8 leading inserts / 8 leading deletes
    val s1 = randDoc(120)
    docs += ((id, s1)); id += 1
    docs += ((id, "xxxxxxxx" + s1)); id += 1
    docs += ((id, s1.drop(8))); id += 1
    import spark.implicits._
    val df = docs.toSeq.map { case (i, t) => (i, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_d8_adv").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupOps.defs.find(_.name == "d8_edit_distance_pairs").get
      .fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute force over all pairs with the same spec (band ±1 + prefix64 lev)
    def lev(x: String, y: String): Int = {
      val dp = Array.tabulate(x.length + 1)(i => i)
      for (j <- 1 to y.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to x.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(x.length)
    }
    val all = docs.toSeq
    val want = (for {
      (i1, t1) <- all; (i2, t2) <- all if i1 < i2
      if math.abs(t1.length / 16 - t2.length / 16) <= 1
      d = lev(t1.take(64), t2.take(64)) if d <= 8
    } yield ((i1, i2), d.toLong)).toMap
    assert(got == want, s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
  }

  test("q32 calendar: dow numbering, ISO week edges, leap February, month-end arithmetic") {
    import spark.implicits._
    val got = Seq("2024-01-07", // Sunday, ISO week 1
      "2024-12-30", // Monday, ISO week 1 of 2025 (year-end edge)
      "2024-02-05", // leap February: last_day = 29th, 24 days to end
      "2023-02-05", // non-leap February
      "2024-01-06") // Saturday
      .toDF("s").select(to_date(col("s")).as("d"))
      .select(col("d"), dayofweek(col("d")).as("dow"),
        weekofyear(col("d")).as("w"),
        datediff(last_day(col("d")), col("d")).as("toEnd"),
        dayofmonth(last_day(col("d"))).as("lastDom"))
      .collect().map(r => r.getDate(0).toString ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got("2024-01-07") == ((1, 1, 24, 31)))  // Sunday = 1 in Spark
    assert(got("2024-01-06") == ((7, 1, 25, 31)))  // Saturday = 7
    assert(got("2024-12-30")._2 == 1)              // ISO week wraps to 1
    assert(got("2024-02-05") == ((2, 6, 24, 29)))  // leap year
    assert(got("2023-02-05") == ((1, 5, 23, 28)))  // non-leap
  }

  test("m6 container audit: valid PNG parses; CRC flip, truncation, trailing bytes all flagged") {
    import spark.implicits._
    val png = MultimodalOps.encodeGrayPng(Array.tabulate(16 * 16)(_.toByte), 16, 16)
    // flip one byte inside the first IDAT chunk's data: the structure
    // still walks (lengths untouched) — only the CRC check catches it
    def be32(p: Array[Byte], off: Int): Long =
      ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
        ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)
    var pos = 8
    while (new String(png, pos + 4, 4, "US-ASCII") != "IDAT")
      pos += 12 + be32(png, pos).toInt
    val crcFlip = png.clone(); crcFlip(pos + 8) = (crcFlip(pos + 8) ^ 0x01).toByte
    val truncated = png.take(png.length - 7)
    val trailing = png ++ Array[Byte](1, 2, 3)
    val rows = Seq(
      (0L, 0, png), (1L, 0, crcFlip), (2L, 0, truncated), (3L, 0, trailing),
      (4L, 1, "not a png at all".getBytes("UTF-8")))
      .map { case (id, k, p) => (id, p, MultimodalOps.MediaMeta(k, 16, 16, p.length)) }
      .toDF("media_id", "payload", "meta")
    val got = MultimodalOps.containerMeta(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(9),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(7)))).toMap
    val (c0, ok0, w0, nc0) = got(0L)
    assert(c0 == "png" && ok0 && w0 == 16L && nc0 >= 3L) // IHDR+IDAT+IEND
    assert(got(1L)._1 == "png" && !got(1L)._2) // CRC flip: structure walks, audit fails
    assert(got(2L)._1 == "png" && !got(2L)._2) // truncated
    assert(got(3L)._1 == "png" && !got(3L)._2) // trailing junk after IEND
    assert(got(4L)._1 == "raw" && got(4L)._2)  // non-container kinds pass through
    // ORACLE PRECONDITION (ADVICE r9): m6's SQL oracle walks chunk
    // framing without CRC checks and labels any magic-prefixed payload
    // 'png', so oracle == engine only on a corpus whose PNG rows are
    // well-formed. The media table's PNGs are engine-encoded, so this
    // holds by construction — pin it: every magic-prefixed row parses
    // ok (audit true), and no stub row carries the magic.
    val media = MultimodalOps.mediaTable(spark, "/root/testdata/sf0.001")
    val corpus = MultimodalOps.containerMeta(media).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      if (r.getString(2) == "png")
        assert(r.getBoolean(9), s"malformed PNG in media corpus: ${r.getLong(0)}")
      else assert(r.getString(2) == "raw")
    }
    // …and no 'raw' row smuggles a magic prefix (the engine calls a
    // <33-byte magic payload raw where the oracle would say png)
    val magic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    media.select("payload").collect().foreach { r =>
      val p = r.getAs[Array[Byte]](0)
      if (p.length >= 8 && p.take(8).sameElements(magic))
        assert(p.length >= 33, "magic-prefixed payload shorter than IHDR")
    }
  }

  test("m7 WAV parse: hand-built PCM cases — extremes, LIST padding, stereo, truncation, bad magic") {
    import spark.implicits._
    def feats(rows: Seq[(Long, Array[Byte])]) =
      MultimodalOps.wavFeatures(rows.toDF("media_id", "payload"))
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2),
          r.getLong(3), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
        .toMap
    val extremes = Array[Short](Short.MinValue, Short.MaxValue, 0, 100)
    val mono = MultimodalOps.encodeWav(extremes, 8000, 1, listChunk = false)
    val withList = MultimodalOps.encodeWav(extremes, 8000, 1, listChunk = true)
    val stereo = MultimodalOps.encodeWav(
      Array.tabulate[Short](16000)(i => (i - 8000).toShort), 8000, 2,
      listChunk = false)
    val truncated = MultimodalOps.encodeWav(extremes, 8000, 1,
      listChunk = false, truncateBytes = 3)
    val badMagic = { val b = mono.clone(); b(0) = 'X'.toByte; b }
    val got = feats(Seq(1L -> mono, 2L -> withList, 3L -> stereo,
      4L -> truncated, 5L -> badMagic))
    val sq = 32768L * 32768 + 32767L * 32767 + 100L * 100
    // extremes: int16 min/max decode signed; 4 frames at 8 kHz → 0 ms
    assert(got(1L) == ((true, 8000L, 1L, 4L, 0L, 32768L, sq)))
    // an odd-sized LIST chunk (RIFF pad rule) changes nothing downstream
    assert(got(2L) == got(1L))
    // stereo: 16000 samples = 8000 frames at 8 kHz → exactly 1000 ms
    val (okS, rateS, chS, nsS, durS, peakS, _) = got(3L)
    assert(okS && rateS == 8000L && chS == 2L && nsS == 16000L &&
      durS == 1000L && peakS == 8000L)
    // truncated data (declared > available) and bad magic: loud not-ok
    assert(got(4L) == ((false, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(5L) == ((false, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("m8 PNG-frame decode: corpus stats equal a direct text-rule recompute; stride is every 3rd frame") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 3 === 2)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = MultimodalOps.aviFrameFeatures(
      MultimodalOps.pngAviTable(spark, "/root/testdata/sf0.001"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5),
          r.getInt(6), r.getInt(7)))).toMap
    assert(got.nonEmpty)
    // every sampled (id, frame) present with the right stride, and the
    // DECODED stats equal the raster rule applied to the text directly
    for ((id, text) <- docs) {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val nFrames = 5 + ((id / 3) % 12).toInt * 2
      val sampled = (0 until nFrames).filter(_ % 3 == 0)
      assert(got.keys.filter(_._1 == id).map(_._2).toSet == sampled.toSet)
      for (f <- sampled) {
        val px = Array.tabulate(64)(j =>
          if (bytes.isEmpty) 0 else bytes((f * 64 + j) % bytes.length) & 0xFF)
        val exp = (8, 8, px.map(_.toLong).sum,
          px.map(v => v.toLong * v).sum, px.min, px.max)
        assert(got((id, f)) == exp, s"id=$id frame=$f")
      }
    }
  }

  test("m8 walk: hand-built AVIs — known raster, LIST descend, truncated frame skipped") {
    import spark.implicits._
    def feats(rows: Seq[(Long, Array[Byte])], k: Int) =
      MultimodalOps.aviFrameFeatures(rows.toDF("media_id", "payload"), k)
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7)))).toMap
    val ramp = Array.tabulate[Byte](64)(_.toByte) // pixels 0..63
    val png = MultimodalOps.encodeGrayPng(ramp, 8, 8)
    val one = MultimodalOps.encodeAvi(33333, 8, 8, Seq(png), 1)
    val got = feats(Seq(10L -> one), k = 1)
    val sum = (0 until 64).map(_.toLong).sum
    val sq = (0 until 64).map(v => v.toLong * v).sum
    assert(got == Map((10L, 0) -> ((sum, sq, 0, 63))))
    // a frame chunk whose declared length runs past the container end
    // is skipped, not decoded-on-garbage: cut INSIDE the PNG payload
    // (RIFF 12 + LIST(hdrl) 76 + movi header 12 + chunk header 8 +
    // 10 payload bytes)
    val truncated = java.util.Arrays.copyOf(one, 12 + 76 + 12 + 8 + 10)
    assert(feats(Seq(11L -> truncated), k = 1).isEmpty)
    // stride: 3 frames at k=2 → frames 0 and 2 only
    val three = MultimodalOps.encodeAvi(33333, 8, 8, Seq(png, png, png), 3)
    assert(feats(Seq(12L -> three), k = 2).keySet ==
      Set((12L, 0), (12L, 2)))
  }

  test("m10 MJPEG: flat-block exactness, bounded loss, decode-error audit, layout independence") {
    import spark.implicits._
    def feats(rows: Seq[(Long, Array[Byte])], k: Int) =
      MultimodalOps.mjpegFrameFeatures(rows.toDF("media_id", "payload"), k)
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7), r.getBoolean(8))))
        .toMap
    // JPEG preserves a UNIFORM 8×8 block exactly (DC-only): exact stats
    val flat = Array.fill[Byte](64)(128.toByte)
    val flatJpg = MultimodalOps.encodeGrayJpeg(flat, 8, 8)
    val one = MultimodalOps.encodeAvi(33333, 8, 8, Seq(flatJpg), 1)
    assert(feats(Seq(10L -> one), k = 1) ==
      Map((10L, 0) -> ((64L * 128, 64L * 128 * 128, 128, 128, true))))
    // a patterned frame: lossy, but the decoded mean stays close
    val ramp = Array.tabulate[Byte](64)(i => (i * 4).toByte)
    val rampJpg = MultimodalOps.encodeGrayJpeg(ramp, 8, 8)
    val two = MultimodalOps.encodeAvi(33333, 8, 8, Seq(rampJpg), 1)
    val (s2, _, mn2, mx2, ok2) = feats(Seq(11L -> two), k = 1)((11L, 0))
    assert(ok2)
    val origMean = ramp.map(_ & 0xFF).sum / 64.0
    assert(math.abs(s2 / 64.0 - origMean) <= 8.0, s"mean drifted: ${s2 / 64.0}")
    assert(mn2 >= 0 && mx2 <= 255 && mn2 <= mx2)
    // decode-error audit: a truncated JPEG yields ok=false, zeros —
    // never a task failure, never a silently missing row
    val mixed = MultimodalOps.encodeAvi(33333, 8, 8,
      Seq(flatJpg, rampJpg.take(8)), 2)
    val m = feats(Seq(12L -> mixed), k = 1)
    assert(m((12L, 0))._5 && !m((12L, 1))._5)
    assert(m((12L, 1)) == ((0L, 0L, 0, 0, false)))
    // corpus: planted bad frames surface as ok=false on the sampling
    // stride; stats are identical under any partition layout
    val avis = MultimodalOps.mjpegAviTable(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      MultimodalOps.mjpegFrameFeatures(df, k = 3)
        .collect().map(_.toString).sorted.toSeq
    val r1 = run(avis.repartition(1))
    val r7 = run(avis.repartition(7))
    assert(r1 == r7 && r1.nonEmpty)
    assert(r1.exists(_.contains("false")), "planted decode errors missing")
  }

  test("m9 AVI audit: planted interrupted writes flagged; well-formed rows ok; bad magic loud") {
    import spark.implicits._
    val audit = MultimodalOps.aviMeta(
      MultimodalOps.aviTable(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(6), r.getLong(7)))).toMap
    assert(audit.nonEmpty)
    var interrupted = 0
    for ((id, (ok, declared, found)) <- audit) {
      if (id % 19 == 0) {
        assert(!ok && declared == found + 3, s"id=$id")
        interrupted += 1
      } else assert(ok && declared == found, s"id=$id")
    }
    assert(interrupted > 0, "corpus lost its planted interrupted writes")
    // bad magic: audited not-ok, never walked
    val png = MultimodalOps.encodeGrayPng(new Array[Byte](64), 8, 8)
    val bad = MultimodalOps.encodeAvi(33333, 8, 8, Seq(png), 1)
    bad(0) = 'X'.toByte
    val r = MultimodalOps.aviMeta(Seq(1L -> bad).toDF("media_id", "payload"))
      .collect()(0)
    assert(!r.getBoolean(1) && r.getLong(7) == 0L)
  }

  test("p4 block manifest: token conservation; every non-final block filled to exactly 512") {
    val rows = CorpusPipeline.defs.find(_.name == "p4_block_manifest").get
      .fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // blocks are the contiguous prefix 0..max of the token stream
    assert(rows.map(_._1).toSeq == (0L until rows.length.toLong))
    // the stream is gapless: every block except the last holds exactly
    // 512 tokens, and the total equals the gated+deduped stream length
    rows.dropRight(1).foreach { case (b, _, filled, _) =>
      assert(filled == 512L, s"block $b filled=$filled") }
    val streamLen = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 5)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .agg(sum(col("n_tok") + 1)).collect().head.getLong(0)
    assert(rows.map(_._3).sum == streamLen)
    assert(rows.last._3 == streamLen - 512L * (rows.length - 1))
  }

  test("w5 z-order layout: BOTH dimension predicates skip row groups; answers unchanged") {
    import scala.jdk.CollectionConverters._
    val path = StorageOps.ensureZordered(spark, sf)
    def utcMicros(s: String): Long = java.time.LocalDateTime
      .parse(s).toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val (loT, hiT) = (utcMicros("2024-01-10T00:00:00"), utcMicros("2024-01-15T00:00:00"))
    // both predicates must reach the scan for footer skipping to fire
    val q = spark.read.parquet(path)
      .filter(col("user_id").between(4, 9) &&
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("user_id") && pushed.contains("ts"), pushed)
    // footer audit: under the Morton sort each row group's zone is
    // tight in BOTH dims, so each predicate alone already skips a
    // majority of groups — a single-column sort can only do one.
    val conf = spark.sessionState.newHadoopConf()
    var total = 0; var hitU = 0; var hitT = 0; var hitBoth = 0
    for (f <- new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet"))) {
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        for (b <- rdr.getFooter.getBlocks.asScala) {
          total += 1
          def stats(name: String) = {
            val st = b.getColumns.asScala.find(_.getPath.toDotString == name).get.getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          }
          val (uMn, uMx) = stats("user_id")
          val (tMn, tMx) = stats("ts")
          val u = uMx >= 4L && uMn <= 9L
          val t = tMx >= loT && tMn < hiT
          if (u) hitU += 1
          if (t) hitT += 1
          if (u && t) hitBoth += 1
        }
      } finally rdr.close()
    }
    assert(total >= 16, s"expected many small row groups, got $total")
    assert(hitU.toDouble / total <= 0.5, s"user zones too loose: $hitU/$total")
    assert(hitT.toDouble / total <= 0.5, s"ts zones too loose: $hitT/$total")
    assert(hitBoth.toDouble / total <= 0.3, s"conjunction should multiply: $hitBoth/$total")
    // layout must not change the answer
    val a = q.agg(count(lit(1)), round(sum("value"), 2)).collect().head
    val b = graft.Tables.events(spark, sf)
      .filter(col("user_id").between(4, 9) &&
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
      .agg(count(lit(1)), round(sum("value"), 2)).collect().head
    assert(a == b)
  }

  test("w6 bloom scan: blooms present; zone maps useless on the scattered key; bloom alone prunes absent keys") {
    import scala.jdk.CollectionConverters._
    val path = StorageOps.ensureBloomed(spark, sf)
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet"))
    // 1. every row group carries a user_id bloom; 2. the ts-ordered
    // layout scatters user_id, so [min,max] zones cover the probe key
    // in nearly every group — zone maps cannot serve this lookup
    var total = 0; var bloomed = 0; var zoneHit = 0
    for (f <- files) {
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try for (b <- rdr.getFooter.getBlocks.asScala) {
        total += 1
        val c = b.getColumns.asScala.find(_.getPath.toDotString == "user_id").get
        if (c.getBloomFilterOffset >= 0) bloomed += 1
        val st = c.getStatistics
        val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
        val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
        if (mn <= 7L && mx >= 7L) zoneHit += 1
      } finally rdr.close()
    }
    assert(total >= 16 && bloomed == total, s"blooms $bloomed/$total")
    assert(zoneHit.toDouble / total >= 0.9, s"zones should be useless: $zoneHit/$total")
    // 3. parquet-mr row-group selection under the BLOOM alone (stats
    // and dictionary filtering off): an absent key drops every group,
    // the present key keeps some — the exact I/O the layout buys
    def groupsFor(key: Long): Int = {
      import org.apache.parquet.filter2.predicate.FilterApi
      import org.apache.parquet.filter2.compat.FilterCompat
      val pred = FilterApi.eq(FilterApi.longColumn("user_id"),
        java.lang.Long.valueOf(key))
      files.map { f =>
        val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
          .withRecordFilter(FilterCompat.get(pred))
          .useBloomFilter(true).useStatsFilter(false)
          .useDictionaryFilter(false).build()
        val rdr = new org.apache.parquet.hadoop.ParquetFileReader(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf), opts)
        try rdr.getRowGroups.size finally rdr.close()
      }.sum
    }
    assert(groupsFor(999999L) == 0, "bloom must drop every group for an absent key")
    assert(groupsFor(7L) > 0)
    // 4. layout must not change the answer
    val a = spark.read.parquet(path).filter(col("user_id").isin(7, 999999))
      .agg(count(lit(1)), round(sum("value"), 2)).collect().head
    val b = graft.Tables.events(spark, sf).filter(col("user_id").isin(7, 999999))
      .agg(count(lit(1)), round(sum("value"), 2)).collect().head
    assert(a == b)
  }

  test("w4 compaction: >=16x file reduction; answers unchanged") {
    val frag = StorageOps.fragmentedFileCount(spark, sf)
    val comp = StorageOps.compactedFileCount(spark, sf)
    assert(frag >= 32, s"fragmented layout should be many files, got $frag")
    assert(comp * 16 <= frag, s"compaction too weak: $frag -> $comp")
    // compaction rewrites bytes, never answers
    val a = spark.read.parquet(StorageOps.ensureCompacted(spark, sf))
      .agg(count(lit(1)), round(sum("value"), 2)).collect().head
    val b = graft.Tables.events(spark, sf)
      .agg(count(lit(1)), round(sum("value"), 2)).collect().head
    assert(a == b)
  }

  test("i1/i2 text sources: adversarial strings round-trip JSONL and CSV") {
    import spark.implicits._
    // quotes, commas, braces, backslashes, leading/trailing spaces —
    // every CSV/JSON dialect trap except embedded newlines (which the
    // line-splittable read contract deliberately excludes)
    val rows = Seq(
      (1L, """plain"""), (2L, """a"b,c{d}"""), (3L, """{"k": "v,w"}"""),
      (4L, """back\slash and ""double"""""), (5L, """ padded """))
    val df = rows.toDF("id", "s")
    val base = java.nio.file.Files.createTempDirectory("graft_srcspec")
    val (jp, cp) = (s"$base/j", s"$base/c")
    df.coalesce(1).write.json(jp)
    df.coalesce(1).write.option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(cp)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val fromJson = spark.read.schema(schema).json(jp)
      .as[(Long, String)].collect().toSet
    val fromCsv = spark.read.schema(schema)
      .option("header", "true").option("escape", "\"").csv(cp)
      .as[(Long, String)].collect().toSet
    assert(fromJson == rows.toSet, s"json: $fromJson")
    assert(fromCsv == rows.toSet, s"csv: $fromCsv")
  }

  test("t13 BPE: hand-computed merges; encode-equals-training roundtrip") {
    // classic Sennrich example shape: 'aaab'×10 + 'aab'×5 —
    // pair counts round 1: (a,a)=10*2+5=25, (a,b)=15 → merge (a,a)
    val merges = TextAnalysis.bpeTrain(Seq(("aaab", 10L), ("aab", 5L)), 3)
    assert(merges.head == ("a", "a"), s"merges=$merges")
    // round 2 on [aa,a,b]×10 + [aa,b]×5: (aa,a)=10, (aa,b)=5, (a,b)=10
    // → tie (aa,a) vs (a,b) at 10 breaks lexicographically: ("a","b")
    assert(merges(1) == ("a", "b"), s"merges=$merges")
    // round 3 merges the two halves: ("aa","ab")
    assert(merges(2) == ("aa", "ab"), s"merges=$merges")
    def rankOf(ms: Seq[(String, String)]) = {
      val r = new java.util.HashMap[String, Integer]()
      ms.zipWithIndex.foreach { case ((a, b), i) =>
        r.put(a + " " + b, Integer.valueOf(i)) }
      r
    }
    val rank = rankOf(merges)
    // encoding reproduces training's segmentation, and concatenating
    // the tokens always reproduces the word (lossless segmentation)
    for (w <- Seq("aaab", "aab", "ab", "ba", "aaaa", "x", "")) {
      val toks = TextAnalysis.bpeEncodeWord(w, rank)
      assert(toks.mkString == w, s"$w -> ${toks.toSeq}")
    }
    // full table collapses the training word; the 2-merge prefix
    // stops at the intermediate segmentation
    assert(TextAnalysis.bpeEncodeWord("aaab", rank).toSeq == Seq("aaab"))
    assert(TextAnalysis.bpeEncodeWord("aaab",
      rankOf(merges.take(2))).toSeq == Seq("aa", "ab"))
    // empty merge table ⇒ characters
    assert(TextAnalysis.bpeEncodeWord("abc",
      new java.util.HashMap[String, Integer]()).toSeq == Seq("a", "b", "c"))
  }

  test("t13 BPE: incremental trainer equals the recount oracle (corpus dict + fuzz); 8k merges proven on a deep dict") {
    import spark.implicits._
    // (a) old == new on the REAL corpus dictionary at the pre-r10
    // merge count — the equivalence that justified swapping trainers
    val wc = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(TextAnalysis.bpeTrain(wc, 40) == TextAnalysis.bpeTrainRecount(wc, 40))
    // (b) randomized dicts: skewed counts force plenty of ties, words
    // share prefixes/suffixes so merges cascade
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val dict = (0 until 120).map { _ =>
        val w = (0 until 1 + rnd.nextInt(8))
          .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        w -> (1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, vs) => (w, vs.map(_._2).sum) }.toSeq
      assert(TextAnalysis.bpeTrain(dict, 60) ==
        TextAnalysis.bpeTrainRecount(dict, 60), s"seed=$seed")
    }
    // (c) exhaustion honesty: the test corpus holds only 31 distinct
    // words, so its dict runs DRY long before a production merge
    // count — the trainer must stop early-and-clean, never return
    // more than requested, and never learn a duplicate merge
    val corpus = TextAnalysis.bpeTrain(wc, 8192)
    assert(corpus.nonEmpty && corpus.size < 8192,
      s"corpus dict was expected to exhaust, got ${corpus.size}")
    assert(corpus.distinct.size == corpus.size)
    assert(corpus.take(40) == TextAnalysis.bpeTrainRecount(wc, 40))
    // (d) the r11 production merge count PROVEN at full depth
    // (VERDICT r10 task 6): a 20k-word high-entropy dict (16-char
    // alphabet, Zipf-ish counts) carries enough distinct pairs to
    // sustain 8192 real merges; the incremental trainer must deliver
    // all of them in seconds (the recount trainer was O(dict·merges)
    // and could not)
    val rnd8 = new scala.util.Random(42)
    val bigDict = (0 until 20000).map { i =>
      val w = (0 until 6 + rnd8.nextInt(10))
        .map(_ => ('a' + rnd8.nextInt(16)).toChar).mkString
      w -> (1L + 100000L / (i + 7))
    }.groupBy(_._1).map { case (w, vs) => (w, vs.map(_._2).sum) }.toSeq
    val t0 = System.nanoTime()
    val big = TextAnalysis.bpeTrain(bigDict, 8192)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(big.size == 8192, s"trainer returned ${big.size} of 8192")
    assert(big.distinct.size == big.size)
    assert(secs < 120.0, f"8k merges took $secs%.1f s — trainer regressed")
    // the incremental selection equals the recount oracle on a deep
    // prefix of the same dict (full 8192 would be O(dict·merges))
    assert(big.take(60) == TextAnalysis.bpeTrainRecount(bigDict, 60))
  }

  test("t13 BPE: capped vocab equals uncapped on the corpus; cap keeps top-K by (count desc, word asc)") {
    import spark.implicits._
    // (a) the 2^16 production cap never cuts the test corpus, so the
    // capped trainer must learn exactly the uncapped trainer's merges
    // (this is the invariant that keeps the t13 golden pinned)
    val docs = graft.Tables.documents(spark, sf)
    def dict(limit: Option[Int]): Seq[(String, Long)] = {
      val wc = docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val cut = limit.fold(wc)(k => wc.orderBy(col("c").desc, col("w").asc).limit(k))
      cut.as[(String, Long)].collect().sortBy(_._1).toSeq
    }
    val uncapped = dict(None)
    assert(uncapped.size < (1 << 16),
      s"test corpus vocab ${uncapped.size} outgrew the cap — re-pin the golden")
    assert(dict(Some(1 << 16)) == uncapped)
    assert(TextAnalysis.bpeTrain(dict(Some(1 << 16)), 40) ==
      TextAnalysis.bpeTrain(uncapped, 40))
    // (b) when the cap DOES cut, it keeps exactly the top-K under the
    // total order (count desc, word asc) — ties on count fall to the
    // lexicographically smaller word, so the cut is deterministic
    // under any partitioning
    val k = 5
    val capped = dict(Some(k))
    val expect = uncapped.sortBy { case (w, c) => (-c, w) }.take(k).sortBy(_._1)
    assert(capped == expect, s"capped=$capped expect=$expect")
  }

  test("k2 heavy hitters: two-pass Misra-Gries equals naive groupBy on planted skew") {
    import spark.implicits._
    // vocabulary (500) >> k (20), so the per-partition sketches MUST
    // evict; the planted heavy tokens survive by the pigeonhole
    // guarantee and the exact second pass removes any false candidates
    val rnd = new scala.util.Random(7L)
    val heavy = Seq.fill(4000)("the") ++ Seq.fill(2500)("and") ++
      Seq.fill(1500)("of")
    val tail = Seq.fill(12000)(s"w${rnd.nextInt(500)}")
    val toks = rnd.shuffle(heavy ++ tail).toDF("token").repartition(8)
    val k = 20
    val got = TextAnalysis.heavyHitters(toks, "token", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = (heavy ++ tail).size.toLong
    val naive = (heavy ++ tail).groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 * k > n).toMap
    assert(got == naive, s"got=$got naive=$naive")
    assert(got.contains("the") && got.contains("and"))
  }

  test("t14 mix weights: weights sum to 1; small sources oversample") {
    val out = TextAnalysis.defs.find(_.name == "t14_mix_weights").get
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    // α = 0.5 temperature: the smallest source must get MORE epochs
    // (oversampling) than the largest
    val bySize = out.sortBy(_._2)
    assert(bySize.head._4 > bySize.last._4,
      s"small ${bySize.head} should oversample vs large ${bySize.last}")
  }

  test("t15 epoch order: pos is the rank under the hash total order") {
    val out = TextAnalysis.defs.find(_.name == "t15_epoch_order").get
      .fn(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    val ids = out.map(_._1)
    // a permutation of 1..N …
    assert(out.map(_._2).sorted.toSeq == (1L to ids.length).toSeq)
    // … equal to the driver-side rank under ((id*2654435761) % 2^20, id)
    val want = ids.sortBy(id => ((id * 2654435761L) % 1048576L, id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(out.toMap == want)
  }

  test("t16 token blocks: equals driver-side prefix sum over the hash order") {
    val out = TextAnalysis.defs.find(_.name == "t16_token_blocks").get
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    val ordered = docs.sortBy { case (id, _) => ((id * 2654435761L) % 1048576L, id) }
    var tok = 0L
    val want = ordered.zipWithIndex.map { case ((id, nt), i) =>
      val st = tok
      tok += nt + 1
      (id, i + 1L, st, st / 512, (st + nt - 1) / 512)
    }.toSet
    assert(out.toSet == want)
    // the global stream is contiguous: the running offset ends at
    // Σ(n_tok + 1) — no gaps, no overlaps, partition-independent
    assert(tok == docs.map(_._2 + 1).sum)
  }

  test("t20 dup-ngram fraction: planted shared runs; within-doc repeats don't count") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " a1 a2 a3 a4"), // 12 toks → 5 grams; pos 0 shared
      (2L, "b1 b2 b3 b4 " + shared), // 12 toks → 5 grams; pos 4 shared
      (3L, (1 to 12).map(i => s"c$i").mkString(" ")), // unique: 0 shared
      (4L, (1 to 8).map(i => s"r$i").mkString(" ") + " " +
        (1 to 8).map(i => s"r$i").mkString(" "))) // self-repeat only
      .toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
    val out = TextAnalysis.dupNgramFraction(tok, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((5L, 1L)) && out(2L) == ((5L, 1L)))
    assert(out(3L) == ((5L, 0L)))
    // doc 4's duplicated run appears in ONE doc: nd=1, never "shared" —
    // within-doc repetition is t9's axis, not t20's
    assert(out(4L) == ((9L, 0L)))
  }

  test("s14 EMA recurrence: differential vs in-memory ordered replay") {
    val q = EventOps.defs.find(_.name == "s14_ema_recurrence").get
    val got = q.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rows = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        // microsecond-exact ordering key (getTime alone floors to ms)
        val micros = math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        (r.getLong(0), micros, r.getLong(2), r.getDouble(3))
      }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      var ema = 0.0
      rs.sortBy(t => (t._2, t._3)).zipWithIndex.map { case ((_, _, eid, v), i) =>
        ema = if (i == 0) v else 0.2 * v + 0.8 * ema
        eid -> BigDecimal(ema).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq
    }
    assert(got.size == rows.length)
    assert(expected.forall { case (eid, e) => got(eid) == e })
  }

  test("a7 knn classify: planted neighborhoods; majority and tie rules") {
    import spark.implicits._
    // query 0 = e1; neighbors at controlled cosines cos(v_i, q) = c_i
    // via v_i = c_i·e1 + sqrt(1−c_i²)·e2 — ranking is exactly c_i desc
    def v(c: Double): Array[Float] =
      Array(c.toFloat, math.sqrt(1 - c * c).toFloat, 0f, 0f)
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 9),
      (1L, v(0.9), 1), (2L, v(0.8), 1),
      (3L, v(0.7), 2), (4L, v(0.6), 2), (5L, v(0.5), 2),
      (6L, v(0.1), 1)) // outside k=5
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.knnClassify(emb, nQueries = 1, k = 5).collect()
    assert(got.length == 1)
    val r = got.head
    // labels among the 5 NN: [1,1,2,2,2] → majority 2; true label rides
    assert(r.getAs[Long]("true_label") == 9L)
    assert(r.getAs[Long]("pred_label") == 2L)
    assert(r.getAs[Long]("votes") == 3L)
    // 2–2 vote tie at k=4 → smaller label wins (votes desc, label asc)
    val tied = SimilarityOps.knnClassify(
      Seq((0L, Array(1f, 0f, 0f, 0f), 9),
        (1L, v(0.9), 5), (2L, v(0.8), 5),
        (3L, v(0.7), 3), (4L, v(0.6), 3))
        .toDF("vec_id", "embedding", "label"),
      nQueries = 1, k = 4).collect().head
    assert(tied.getAs[Long]("pred_label") == 3L)
    assert(tied.getAs[Long]("votes") == 2L)
  }

  test("s15 cumulative uniques: hand-computed curve on planted hours") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), 101L),
      (1L, t("2024-01-01 10:30:00"), 102L),
      (2L, t("2024-01-01 10:45:00"), 103L),
      (1L, t("2024-01-01 11:10:00"), 104L),
      (3L, t("2024-01-01 11:20:00"), 105L),
      (3L, t("2024-01-01 13:05:00"), 106L)) // hour gap; no new users
      .toDF("user_id", "ts", "event_id")
    val got = EventOps.cumulativeUniques(events)
      .orderBy("h").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 10:00:00.0", 2L, 3L, 2L),
      ("2024-01-01 11:00:00.0", 1L, 2L, 3L),
      ("2024-01-01 13:00:00.0", 0L, 1L, 3L)))
  }

  test("s16 LOCF: -1 before first purchase; carries across later events") {
    // drive through the real entry against sf0.001 and replay in memory
    val q = EventOps.defs.find(_.name == "s16_locf").get
    val got = q.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        val micros = math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        (r.getLong(0), micros, r.getLong(2), r.getString(3), r.getDouble(4))
      }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      var lastP = -1.0
      rs.sortBy(t => (t._2, t._3)).map { case (_, _, eid, et, v) =>
        if (et == "purchase") lastP = v
        eid -> BigDecimal(lastP).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq
    }
    assert(got.size == rows.length)
    assert(expected.forall { case (eid, e) => got(eid) == e })
  }

  test("i4 ORC: adversarial strings round-trip; predicate pushes to the scan") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a\"b,{c}", 1.5, "x\\y\"z"),
      (2L, "plain", -0.25, ""),
      (3L, " padded ", 1e-300, "{\"k\": \"v,w\"}"))
      .toDF("event_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    rows.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(rows.schema).orc(dir)
    assert(back.collect().toSet == rows.collect().toSet)
    // stripe-stat pushdown: the range predicate must reach the ORC scan
    val plan = back.filter(col("event_id") > 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(event_id"), plan.takeRight(400))
  }

  test("s11 funnel: randomized differential vs in-memory replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val types = Array("signup", "view", "purchase", "click")
    val ev = (1 to 4000).map { i =>
      (rnd.nextInt(80).toLong, i.toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(2000000) * 1000L),
        types(rnd.nextInt(4)))
    }
    val got = EventOps.funnel(ev.toDF("user_id", "event_id", "ts", "event_type"))
      .collect().head
    // replay: per user sort by (ts, event_id), walk the strict chain
    var (n1, n2, n3) = (0L, 0L, 0L)
    for ((_, rows) <- ev.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (r._3.getTime, r._2))
      var rs = Long.MaxValue; var rv = Long.MaxValue
      var (s1, s2, s3) = (false, false, false)
      for ((_, _, ts, ty) <- sorted) {
        val t = ts.getTime
        if (ty == "signup") { s1 = true; rs = math.min(rs, t) }
        if (ty == "view" && t > rs) { s2 = true; rv = math.min(rv, t) }
        if (ty == "purchase" && t > rv) s3 = true
      }
      if (s1) n1 += 1; if (s2) n2 += 1; if (s3) n3 += 1
    }
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((n1, n2, n3)))
  }

  test("s11/q23 plans: stacked windows share one corpus exchange") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def shape(df: org.apache.spark.sql.DataFrame) = {
        val plan = df.queryExecution.executedPlan
        (plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.size,
          plan.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }.size)
      }
      // funnel: both window passes AND the per-user flag aggregate ride
      // the user_id exchange; the only other exchange is the 1-row
      // final reduce
      val s11 = EventOps.funnel(graft.Tables.events(spark, sf))
      assert(shape(s11) == ((2, 2)), s"s11=${shape(s11)}")
      // q23: both RANGE-frame measures compute in ONE WindowExec on one
      // hash exchange; the second exchange is the output range sort
      val q23 = Relational.defs.find(_.name == "q23_range_frame").get
        .fn(spark, sf)
      assert(shape(q23) == ((2, 1)), s"q23=${shape(q23)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("s9 cohort retention: hand-computed grid on planted user-weeks") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // Mondays: 2024-01-01, 01-08, 01-15. u1 first week w0, active
    // w0+w2 (two events in w0 — distinct must collapse them);
    // u2 first week w0, active w0 only; u3 first week w1, active w1+w2.
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-03 09:00:00")),
      (1L, t("2024-01-16 12:00:00")),
      (2L, t("2024-01-02 08:00:00")),
      (3L, t("2024-01-08 23:00:00")), (3L, t("2024-01-20 07:00:00")))
      .toDF("user_id", "ts")
    val got = EventOps.cohortRetention(ev)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("s11 funnel: strict stage ordering on planted user journeys") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    var id = 0L
    def e(u: Long, ts: String, ty: String) = { id += 1; (u, id, t(ts), ty) }
    val ev = Seq(
      // u1: full journey in order → all 3 stages
      e(1, "2024-01-01 10:00:00", "signup"), e(1, "2024-01-01 10:05:00", "view"),
      e(1, "2024-01-01 10:10:00", "purchase"),
      // u2: view BEFORE signup doesn't qualify; purchase with no
      // qualifying view doesn't either → stage 1 only
      e(2, "2024-01-01 09:00:00", "view"), e(2, "2024-01-01 10:00:00", "signup"),
      e(2, "2024-01-01 10:30:00", "purchase"),
      // u3: purchase BEFORE the qualifying view → stages 1+2
      e(3, "2024-01-01 10:00:00", "signup"), e(3, "2024-01-01 10:04:00", "purchase"),
      e(3, "2024-01-01 10:05:00", "view"),
      // u4: never signs up → no stages
      e(4, "2024-01-01 10:00:00", "view"), e(4, "2024-01-01 10:10:00", "purchase"),
      // u5: view at the EXACT signup ts — strict > excludes it
      e(5, "2024-01-01 10:00:00", "signup"), e(5, "2024-01-01 10:00:00", "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = EventOps.funnel(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 2L, 1L))
  }

  test("q23 range frame: differential vs in-memory trailing-window scan") {
    // Brute-force the trailing [ts-1h, ts] per-user sum/count over
    // sf0.001 and compare every row against the engine's RANGE frame.
    val got = Relational.defs.find(_.name == "q23_range_frame").get
      .fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getDouble(3)))
    val byUser = ev.groupBy(_._2)
    assert(got.size == ev.length)
    for ((_, rows) <- byUser; (eid, u, ts, _) <- rows) {
      val frame = rows.filter(r => r._3 >= ts - 3600000L && r._3 <= ts)
      // exact decimal sum like the engine's DECIMAL(18,6) path
      val sv = frame.map(r => BigDecimal(r._4).setScale(6)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gu, gsv, gn) = got(eid)
      assert(gu == u && gn == frame.length.toLong && math.abs(gsv - sv) < 1e-9,
        s"eid=$eid got=($gu,$gsv,$gn) want=($u,$sv,${frame.length})")
    }
  }

  test("q29 unpivot: melted rows conserve each measure's sum and count") {
    // The Expand-based melt must neither drop nor duplicate rows: per
    // measure, the long-form aggregate equals the direct column sum.
    val sf1 = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sf1)
    val direct = li.agg(
      round(sum("l_quantity"), 2), round(sum("l_extendedprice"), 2),
      round(sum("l_discount"), 2), round(sum("l_tax"), 2), count(lit(1)))
      .collect().head
    val n = direct.getLong(4)
    val melted = Relational.defs.find(_.name == "q29_unpivot").get
      .fn(spark, sf1).collect()
      .groupBy(_.getString(0))
      .map { case (m, rows) =>
        m -> ((rows.map(r => BigDecimal(r.getDouble(2))).sum, rows.map(_.getLong(3)).sum)) }
    assert(melted.keySet == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    for ((m, want) <- Seq("l_quantity" -> direct.getDouble(0),
        "l_extendedprice" -> direct.getDouble(1),
        "l_discount" -> direct.getDouble(2), "l_tax" -> direct.getDouble(3))) {
      val (sv, c) = melted(m)
      assert(c == n, s"$m count=$c want=$n")
      // group-level ROUND(·,2) values re-sum exactly in BigDecimal
      assert((sv - BigDecimal(want)).abs <= BigDecimal("0.04"), s"$m sum=$sv want=$want")
    }
  }

  test("q30 percentile: linear interpolation at p*(n-1), hand-computed") {
    import spark.implicits._
    // 4 values → p25 index 0.75: 10 + 0.75*(20-10) = 17.5; p50 = 25;
    // p75 index 2.25: 30 + 0.25*(40-30) = 32.5. Odd group: exact middle.
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
      ("b", 1.0), ("b", 5.0), ("b", 9.0)).toDF("g", "v")
    val got = df.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") == ((17.5, 25.0, 32.5)))
    assert(got("b") == ((3.0, 5.0, 7.0)))
  }

  test("q31 window distribution: ties share percent_rank/cume_dist; singleton group is 0/1") {
    import spark.implicits._
    val df = Seq((1L, 100.0), (2L, 100.0), (3L, 200.0), (4L, 300.0))
      .map { case (k, v) => (k, 7L, v) }
      .toDF("id", "g", "v")
      .union(Seq((9L, 8L, 50.0)).toDF("id", "g", "v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")
    val got = df.select(col("id"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"),
      dense_rank().over(w).cast("long").as("dr"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    // peers (ids 1,2) share rank 1 → pr 0, cd 2/4; dense ranks compact
    assert(got(1L) == ((0.0, 0.5, 1L)) && got(2L) == ((0.0, 0.5, 1L)))
    assert(got(3L) == ((2.0 / 3.0, 0.75, 2L)))
    assert(got(4L) == ((1.0, 1.0, 3L)))
    // singleton partition: percent_rank defined as 0, cume_dist 1
    assert(got(9L) == ((0.0, 1.0, 1L)))
  }

  test("k1 sketch distinct: error bound vs exact, layout-independent") {
    import spark.implicits._
    val base = (1 to 20000).map(i => (s"t${i % 4}", (i * 2654435761L) % 3000))
      .toDF("event_type", "user_id")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("event_type")
      .agg(graft.functions.HllAgg.column(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val r3 = run(base.repartition(3))
    val r17 = run(base.repartition(17))
    // register-max merge ⇒ identical estimates under any partitioning
    assert(r3 == r17)
    // m=4096 ⇒ rse ≈ 1.6%; |approx-exact|/exact within a few sigma
    r3.foreach { case (ty, a, x) =>
      assert(math.abs(a - x).toDouble / x <= 0.06, s"$ty approx=$a exact=$x") }
    // the estimator kernel itself: empty sketch = 0; single value = 1;
    // register/rank extraction matches the documented layout
    import graft.functions.HllAgg
    assert(HllAgg.estimate(HllAgg.zero) == 0L)
    assert(HllAgg.estimate(HllAgg.reduce(HllAgg.zero, 42L)) == 1L)
    val h = HllAgg.hash(42L)
    val (idx, r) = HllAgg.registerOf(h)
    assert(idx == (h >>> 52).toInt)
    assert(r == math.min(java.lang.Long.numberOfLeadingZeros(h << 12) + 1, 41))
  }

  test("k4 count-min: one-sided error, bounded grid, layout-independent") {
    import spark.implicits._
    // planted skew: key 7 is a heavy hitter (5000 rows) over a 3000-key
    // tail — collisions in the 256-bucket rows are guaranteed, so the
    // one-sided property is exercised, not vacuous
    val keys = (Seq.fill(5000)(7L) ++
      (1 to 20000).map(i => (i * 2654435761L) % 3000)).toDF("k")
    val grid3 = EventOps.cmsGrid(keys.repartition(3), "k")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val grid17 = EventOps.cmsGrid(keys.repartition(17), "k")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cell-wise-sum merge ⇒ the grid is a pure function of the multiset
    assert(grid3 == grid17)
    // the sketch is bounded by construction: ≤ D·W cells, counters
    // conserve mass per hash row
    assert(grid3.size <= 4 * 256)
    (0 until 4).foreach { i =>
      assert(grid3.collect { case ((r, _), c) if r == i => c }.sum == 25000L)
    }
    // estimates: cms >= exact for EVERY key (one-sided), and the heavy
    // hitter's overcount is bounded by the worst tail bucket
    val exact = keys.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
    val est = EventOps.cmsLookup(exact, "k", EventOps.cmsGrid(keys, "k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(est.length == exact.count())
    est.foreach { case (k, ex, cms) =>
      assert(cms >= ex, s"key $k: cms=$cms < exact=$ex") }
    // ε = e/W bound with D independent rows: deterministic given the
    // fixed hashes — 4× the expected N/W tail overcount is generous
    val n = 25000L
    est.foreach { case (k, ex, cms) =>
      assert(cms - ex <= 4 * n / 256, s"key $k overcount ${cms - ex}") }
  }

  test("k5 AMS: exact counters layout-independent, estimate near F2") {
    import spark.implicits._
    // planted Zipf-ish skew so F2 is dominated by a few heavy keys —
    // the regime the sketch exists for
    val keys = ((1 to 4000).flatMap(i => Seq.fill(4000 / i)(i.toLong))).toDF("k")
    def counters(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      EventOps.amsCounters(df, "k").collect()(0)
        .toSeq.map(_.asInstanceOf[Long])
    val c3 = counters(keys.repartition(3))
    val c17 = counters(keys.repartition(17))
    // each counter is an exact integer sum ⇒ pure function of the
    // multiset, independent of partitioning
    assert(c3 == c17 && c3.length == 64)
    val n = keys.count()
    // counters are bounded by the row count and not degenerate
    assert(c3.forall(c => math.abs(c) <= n) && c3.distinct.length > 1)
    // estimate: Σc²/R is unbiased with σ = √(2/R)·F2 ≈ 0.18·F2 for
    // R=64 — assert within 4σ of the exact second moment
    val f2 = keys.groupBy("k").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).collect()(0).getLong(0).toDouble
    val est = c3.map(c => c.toDouble * c).sum / 64.0
    assert(math.abs(est - f2) <= 4 * math.sqrt(2.0 / 64) * f2,
      s"est=$est f2=$f2")
  }

  test("q35 pointer jumping: 10k-deep chain flattens in O(log d) rounds") {
    import spark.implicits._
    // worst case for any per-level walker: one chain, depth 9999
    val chain = (0L until 10000L)
      .map(n => (n, math.max(n - 1, 0L))).toDF("node", "parent")
    val (flat, iters) = graft.operators.Hierarchy.flatten(chain)
    val rows = flat.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 10000)
    (0L until 10000L).foreach { n => assert(rows(n) == ((0L, n))) }
    // path doubling: known distance doubles per round — ceil(log2 9999)
    // = 14 growth rounds + 1 fixpoint-detection round
    assert(iters <= 15, s"iters=$iters — pointer jumping degraded to BFS?")

    // forest with several roots and mixed depths: each node lands on
    // its own tree's root, roots stay self-assigned at depth 0
    val forest = Seq((1L, 1L), (2L, 2L), (10L, 1L), (11L, 10L),
      (12L, 11L), (20L, 2L)).toDF("node", "parent")
    val f = graft.operators.Hierarchy.flatten(forest)._1
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(f == Map(1L -> ((1L, 0L)), 2L -> ((2L, 0L)), 10L -> ((1L, 1L)),
      11L -> ((1L, 2L)), 12L -> ((1L, 3L)), 20L -> ((2L, 1L))))
  }

  test("k6 KMV theta: sketch layout-independent, intersection near exact") {
    import spark.implicits._
    // planted 80% overlap: |A|=|B|=10k, |A∩B|=8k, |A∪B|=12k
    val a = (1L to 10000L).toDF("k")
    val b = (2001L to 12000L).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      EventOps.kmvSketch(df, "k").collect().map(_.getLong(0)).toSeq
    // the sketch is a pure function of the SET: partitioning and
    // duplicate rows must not change it
    val sa = sk(a)
    assert(sa == sk(a.repartition(17)) && sa == sk(a.unionAll(a)))
    assert(sa.length == 256 && sa == sa.sorted)
    val sb = sk(b)
    val theta = math.min(sa.max, sb.max)
    val s = sa.toSet.intersect(sb.toSet).count(_ < theta)
    val est = s.toDouble * 9223372036854775808.0 / theta.toDouble
    // theta-sketch intersection rse ≈ √(|A∪B|/|A∩B|)/√K ≈ 7.7% here;
    // fixed hashes make this deterministic — 4σ is generous
    assert(math.abs(est - 8000.0) <= 4 * 0.077 * 8000.0, s"est=$est")
    // union-merge: re-top-K of the union estimates the union size
    val su = (sa ++ sb).distinct.sorted.take(256)
    val estU = 255.0 * 9223372036854775808.0 / su.max.toDouble
    assert(math.abs(estU - 12000.0) <= 4 * 12000.0 / 16.0, s"estU=$estU")
  }

  test("k7 bottom-k quantiles: estimates bracket truth, monotone, deterministic") {
    val entry = EventOps.defs.find(_.name == "k7_quantile_bottomk").get
    val rows = entry.fn(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length == 6 && rows.forall(_._2 == 512L))
    val n = spark.read.parquet(s"$sf/events.parquet").count().toDouble
    rows.foreach { case (q, _, _, cntLe) =>
      // uniform bottom-k sample of K=512: σ(q̂) = √(q(1−q)/K) ≤ 0.0221;
      // fixed hashes make this deterministic — 5σ is generous
      assert(math.abs(cntLe / n - q) <= 5 * 0.0221 + 1.0 / 512,
        s"q=$q rank=${cntLe / n}")
    }
    // order statistics are monotone in q
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    // pure function of the ID set: a second evaluation is identical
    assert(entry.fn(spark, sf).collect().toSeq ==
      entry.fn(spark, sf).collect().toSeq)
  }

  test("k7 sample merges: bottom-K of unioned per-split bottom-Ks equals global") {
    // the KMV property applied to rows: per-day samples fold into a
    // corpus sample without re-reading history
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"),
        shiftrightunsigned(xxhash64(col("event_id")), 1).as("h"))
    def bottomK(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("h", "event_id").limit(512)
    val global = bottomK(ev).collect().map(_.getLong(0)).toSeq
    val a = bottomK(ev.filter(col("event_id") % 2 === 0))
    val b = bottomK(ev.filter(col("event_id") % 2 =!= 0))
    val merged = bottomK(a.unionByName(b)).collect().map(_.getLong(0)).toSeq
    assert(merged == global)
  }

  test("c21 closed-row sink: a replayed epoch overwrites its own directory (c11 recipe)") {
    // scd2Merge's closed rows are append-only per batch; the c11
    // exactly-once recipe fences replays — a re-run epoch REWRITES its
    // epoch dir instead of appending duplicate version rows
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val files = new java.io.File(p).listFiles.map(_.getAbsolutePath).sorted
    val dir = java.nio.file.Files
      .createTempDirectory("graft_c21_lake").toString
    var state: Option[org.apache.spark.sql.DataFrame] = None
    files.zipWithIndex.foreach { case (f, epoch) =>
      val (ns, cl) = CdcQueries.scd2Merge(state,
        CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, f)))
      state = Some(ns.localCheckpoint())
      cl.write.mode("overwrite").parquet(s"$dir/epoch=$epoch")
    }
    val once = spark.read.parquet(s"$dir/epoch=*")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // simulated failure replay: epoch 1 re-merges THE SAME batch
    // against the pre-merge state and rewrites its directory
    var replayState: Option[org.apache.spark.sql.DataFrame] = None
    val (s0, _) = CdcQueries.scd2Merge(None,
      CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, files(0))))
    replayState = Some(s0.localCheckpoint())
    val (_, cl1) = CdcQueries.scd2Merge(replayState,
      CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, files(1))))
    cl1.write.mode("overwrite").parquet(s"$dir/epoch=1")
    val replayed = spark.read.parquet(s"$dir/epoch=*")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(replayed == once)
    // and the lake equals the closed half of the batch history
    val batchClosed = CdcQueries.scd2History(CdcQueries.flattenImages(
      graft.cdc.CdcJob.parse(spark, p)))
      .filter(!col("is_current"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(once == batchClosed)
  }

  test("t26 DSIR weights: target-language docs score higher, selection skews to target") {
    import spark.implicits._
    // planted corpora with disjoint vocabularies: every 'en' doc is
    // pure target text, so any off-target doc must weigh less
    val planted = (
      (1L to 20L).map(i => (i, "en", "the cat sat on the mat")) ++
      (21L to 40L).map(i => (i, "de", "der hund lief durch den wald"))
    ).toDF("doc_id", "lang", "text")
    val w = TextAnalysis.dsirWeights(planted).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val enMin = (1L to 20L).map(w).min
    val deMax = (21L to 40L).map(w).max
    assert(enMin > deMax, s"enMin=$enMin deMax=$deMax")
    // layout-independence: weights are a pure function of the rows
    val w17 = TextAnalysis.dsirWeights(planted.repartition(17)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 40L).forall(i => math.abs(w(i) - w17(i)) < 1e-9))
    // real corpus: mean weight of the target slice exceeds the rest
    // (the importance weight's defining property), and the Gumbel
    // top-64 selection over-represents the target language
    val docs = graft.Tables.documents(spark, sf)
    val byLang = TextAnalysis.dsirWeights(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(org.apache.spark.sql.functions.col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("logw")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false), byLang.toString)
    val entry = TextAnalysis.defs.find(_.name == "t26_dsir_select").get
    val selected = entry.fn(spark, sf).collect()
    val enSel = selected.count(_.getString(1) == "en").toDouble / selected.length
    val enBase = docs.filter("lang = 'en'").count().toDouble / docs.count()
    assert(enSel > enBase, s"selected en=$enSel base=$enBase")
  }

  test("t27 bigram ppl: fluent text scores below token salad; 1-token docs drop") {
    import spark.implicits._
    // corpus: many copies of a patterned sentence (≈80% land in t10's
    // train split), one fluent probe, one SCRAMBLED probe over the
    // same vocabulary, one single-token doc
    val pattern = "the cat sat on the mat and the dog sat on the rug"
    val salad = "mat the rug dog on cat the sat and mat on the sat"
    val docs = ((1L to 50L).map(i => (i, pattern)) ++
      Seq((101L, pattern), (102L, salad), (103L, "lonely"))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramPpl(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(!got.contains(103L)) // no bigrams → no row
    assert(got(101L)._1 == 12L && got(102L)._1 == 12L)
    assert(got(101L)._2 < got(102L)._2,
      s"fluent=${got(101L)._2} salad=${got(102L)._2}")
    // real corpus: every doc with >=2 tokens scored, ppl finite positive
    val entry = TextAnalysis.defs.find(_.name == "t27_bigram_ppl").get
    val rows = entry.fn(spark, sf).collect()
    assert(rows.length >= 500)
    assert(rows.forall(r => r.getDouble(3) > 0 && !r.getDouble(3).isInfinite))
  }

  test("m11 resample: exact 2/3-rate linear interpolation on a known ramp") {
    import spark.implicits._
    // ramp 0,300,600,900 → out i at source 1.5i, scaled ×2:
    // i=0 → 2·s0=0; i=1 → s1+s2=900; i=2 → 2·s3=1800. nOut=3.
    val ramp = MultimodalOps.encodeWav(
      Array[Short](0, 300, 600, 900), 16000, 1, listChunk = false, truncateBytes = 0)
    // stereo clip: the declared audit path (resample is mono-only)
    val stereo = MultimodalOps.encodeWav(
      Array[Short](1, 2, 3, 4), 16000, 2, listChunk = false, truncateBytes = 0)
    val wavs = Seq((1L, ramp), (2L, stereo)).toDF("media_id", "payload")
    val got = MultimodalOps.wavResample(wavs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got(1L) == Seq(true, 4L, 3L, 2700L, 1800L, 0L, 900L, 1800L))
    assert(got(2L).head == false && got(2L)(1) == 4L) // decoded, not resampled
    // linearity: a pure ramp resamples to a pure ramp (×2 scale) — the
    // property any correct linear interpolator preserves
    val n = 99
    val big = MultimodalOps.encodeWav(
      Array.tabulate[Short](n)(i => (i * 10).toShort), 16000, 1,
      listChunk = false, truncateBytes = 0)
    val r = MultimodalOps.wavResample(Seq((3L, big)).toDF("media_id", "payload"))
      .collect()(0)
    val nOut = ((n - 1) * 2) / 3 + 1
    assert(r.getLong(3) == nOut)
    // out_scaled[i] = 2 · 10 · 1.5·i = 30·i exactly
    assert(r.getLong(6) == 0L && r.getLong(8) == 30L * (nOut - 1) &&
      r.getLong(4) == (0 until nOut).map(30L * _).sum)
  }

  test("p6 dataset card: one corpus scan, exact card on a planted corpus") {
    import spark.implicits._
    // the rollup + two distincts + percentiles must still be ONE pass:
    // a single leaf relation in the optimized plan (Expand, not rescans)
    val entry = CorpusPipeline.defs.find(_.name == "p6_dataset_card").get
    val df = entry.fn(spark, sf)
    assert(df.queryExecution.optimizedPlan.collectLeaves().size == 1,
      df.queryExecution.optimizedPlan.toString)
    // planted corpus: known duplicates, token counts, quantiles
    val docs = Seq(
      (1L, "x y", "en", "A", 3L), (2L, "x y", "en", "A", 3L),
      (3L, "z", "de", "A", 1L), (4L, "w w w", "en", "B", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusPipeline.datasetCard(docs).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(got("A") == Seq(3L, 7L, 5L, 2L, 1L, 3.0, 3.0))
    assert(got("B") == Seq(1L, 5L, 3L, 1L, 0L, 5.0, 5.0))
    // TOTAL: 4 docs, 12 chars, 8 tokens, 2 langs, 1 dup;
    // n_chars sorted [1,3,3,5]: p50 = 3.0, p95 = 4.7 (linear interp)
    assert(got("TOTAL") == Seq(4L, 12L, 8L, 2L, 1L, 3.0, 4.7))
  }

  test("q35 pointer jumping: random forests match the direct walk") {
    import spark.implicits._
    for (seed <- Seq(5, 21, 77)) {
      val rnd = new scala.util.Random(seed)
      // random recursive forest: 10 roots, parent(n) < n ⇒ acyclic
      val parent = Array.tabulate(2000)(n => if (n < 10) n else rnd.nextInt(n))
      def walk(n: Int): (Long, Long) = { // (root, depth) by direct chase
        var (cur, d) = (n, 0L)
        while (parent(cur) != cur) { cur = parent(cur); d += 1 }
        (cur.toLong, d)
      }
      val edges = parent.indices.map(n => (n.toLong, parent(n).toLong))
        .toDF("node", "parent")
      val (flat, iters) = graft.operators.Hierarchy.flatten(edges)
      val got = flat.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      parent.indices.foreach { n =>
        assert(got(n.toLong) == walk(n), s"seed $seed node $n") }
      val maxDepth = parent.indices.map(walk(_)._2).max
      val bound = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1, maxDepth)) + 1
      assert(iters <= bound + 1, s"seed $seed iters=$iters maxDepth=$maxDepth")
    }
  }

  test("t24 vocab growth: monotone, saturates at the true vocabulary") {
    import spark.implicits._
    val entry = TextAnalysis.defs.find(_.name == "t24_vocab_growth").get
    val curve = entry.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // Heaps curve properties: non-decreasing in N, never exceeds the
    // independently-computed true vocabulary, and reaches it once the
    // grid passes the corpus length
    assert(curve.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    val trueVocab = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ", -1)).as("t"))
      .agg(countDistinct("t")).collect()(0).getLong(0)
    val totalToks = graft.Tables.documents(spark, sf)
      .select(size(split(col("text"), " ", -1)).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(curve.last._2 == trueVocab, s"${curve.last} vs $trueVocab")
    curve.filter(_._1 >= totalToks).foreach { case (_, v) =>
      assert(v == trueVocab) }
    // the synthetic corpus has a ~31-word generator vocabulary, so the
    // curve saturates within the first grid point — exactly the
    // "duplication/template text" signature the diagnostic exists to
    // expose. Assert that reading: early full saturation.
    assert(curve.head._2 == trueVocab && trueVocab < 100,
      s"head=${curve.head} vocab=$trueVocab")
    // and on a planted OPEN-vocabulary corpus (every token globally
    // fresh: doc i carries w_i_0..w_i_i) the ENGINE's curve must be
    // exactly vocab(N) = min(N, total) — growth, position arithmetic,
    // and grid handling all pinned; repartition(7) proves the
    // distributed prefix sum is layout-independent
    import spark.implicits._
    val open = (0 until 200)
      .map(i => (i.toLong, (0 to i).map(j => s"w_${i}_$j").mkString(" ")))
      .toDF("doc_id", "text").repartition(7)
    val total = (1 to 200).map(_.toLong).sum // 20100 tokens
    val got = TextAnalysis.vocabGrowth(open, Seq(1000L, 16000L, 64000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1000L -> 1000L, 16000L -> 16000L, 64000L -> total))
  }

  test("a11 serving kernel: randomized differential vs in-memory brute force") {
    import spark.implicits._
    // adversarial corpus: deterministic pseudo-random vectors with
    // PLANTED DUPLICATES (ids 50..59 copy 0..9) so rounded-sim ties
    // are real and the (rounded desc, cid asc) break is exercised —
    // the exact failure class the l3 sf1 tie-break fix closed
    def vec(seed: Long): Array[Float] =
      Array.tabulate(16) { i =>
        val h = (seed * 31 + i) * 2654435761L
        ((h % 1000).toFloat / 500f) - 1f
      }
    val cand = (0L until 60L).map(i => (i, vec(if (i >= 50) i - 50 else i)))
    val qs = (0L until 12L).map(q => (q, vec(q * 7 + 3)))
    val candDf = cand.toDF("vec_id", "embedding").repartition(5)
    val qDf = qs.toDF("qid", "qv")
    val got = graft.functions.VectorOps.serveTopK(qDf, candDf, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // in-memory reference with the SAME display rounding (HALF_UP, 5dp)
    def rnd5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = qs.flatMap { case (q, qv) =>
      cand.map { case (c, cv) => (c, rnd5(cos(qv, cv))) }
        .sortBy { case (c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((c, s), i) => (q, (i + 1).toLong, c, s) }
    }
    assert(got.sortBy(r => (r._1, r._2)).toSeq == want.sortBy(r => (r._1, r._2)))
  }

  test("t25 zipf fit: planted exact law recovers slope -1; ranking pinned") {
    import spark.implicits._
    // corpus where term w_i appears exactly floor(4096/i) times: freq
    // is EXACTLY 4096/rank on the head, so the log-log regression must
    // recover slope ≈ -1 with near-perfect R² — the planted law
    val words = (1 to 256).flatMap(i => Seq.fill(4096 / i)(f"w$i%04d"))
    val docs = words.grouped(64).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text").repartition(5)
    val row = TextAnalysis.zipfFit(docs, 256).collect()(0)
    assert(row.getLong(0) == 256)
    val slope = row.getDouble(1); val r2 = row.getDouble(3)
    // floor() quantization perturbs the tail slightly — wide-enough
    // tolerance for that, tight enough to catch a wrong sign/scale
    assert(math.abs(slope + 1.0) < 0.03, s"slope=$slope")
    assert(r2 > 0.999, s"r2=$r2")
    // the real-corpus entry: one row, sane ranges (negative slope,
    // finite intercept), and the head count saturates its cap
    val entry = TextAnalysis.defs.find(_.name == "t25_zipf_fit").get
    val r = entry.fn(spark, sf).collect()(0)
    assert(r.getLong(0) <= 1024 && r.getDouble(1) < 0.0)
  }

  test("c9 state materialization: PK-changing update moves the row") {
    // insert id=1 → update id 1→2 (PK change) → insert id=3 →
    // delete id=3. Final state: ONLY id=2, carrying the update's
    // after image; id=1 was tombstoned by its own PK-move, id=3 by
    // the delete.
    val txt = new StringBuilder
    var pos = 100L
    var sec = 0
    def hdr(kind: String) = {
      txt ++= s"# at $pos\n"
      txt ++= f"#260812  5:00:${sec}%02d server id 1  end_log_pos ${pos + 120} CRC32 0x1a2b3c4d \t$kind: table id 108 flags: STMT_END_F\n"
      pos += 120; sec += 1
    }
    hdr("Write_rows")
    txt ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
    txt ++= "###   @1=1 /* INT */\n###   @2='a' /* VARSTRING(160) */\n###   @3=1.5 /* DOUBLE */\n"
    hdr("Update_rows")
    txt ++= "### UPDATE `testdb`.`t_pk`\n### WHERE\n"
    txt ++= "###   @1=1 /* INT */\n###   @2='a' /* VARSTRING(160) */\n###   @3=1.5 /* DOUBLE */\n"
    txt ++= "### SET\n"
    txt ++= "###   @1=2 /* INT */\n###   @2='b' /* VARSTRING(160) */\n###   @3=2.5 /* DOUBLE */\n"
    hdr("Write_rows")
    txt ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
    txt ++= "###   @1=3 /* INT */\n###   @2='c' /* VARSTRING(160) */\n###   @3=NULL /* DOUBLE */\n"
    hdr("Delete_rows")
    txt ++= "### DELETE FROM `testdb`.`t_pk`\n### WHERE\n"
    txt ++= "###   @1=3 /* INT */\n###   @2='c' /* VARSTRING(160) */\n###   @3=NULL /* DOUBLE */\n"
    val p = graft.cdc.BinlogFixture.materialize("c9_pkmove", txt.result())
    val got = CdcQueries.materializeFromFlat(
      CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq(("testdb", "t_pk", 2L, "'b'", "2.5")))
  }

  test("c20 SCD2 history: versions tile the key timeline, PK moves close/open") {
    // reuse the c9 PK-move scenario: insert id=1 → update 1→2 (PK
    // change) → insert id=3 → delete id=3. Expected histories:
    //   id=1: v1 closed by its own PK-move tombstone (not current)
    //   id=2: v1 open (current)
    //   id=3: v1 closed by the delete (not current)
    val txt = new StringBuilder
    var pos = 100L
    var sec = 0
    def hdr(kind: String) = {
      txt ++= s"# at $pos\n"
      txt ++= f"#260812  5:00:${sec}%02d server id 1  end_log_pos ${pos + 120} CRC32 0x1a2b3c4d \t$kind: table id 108 flags: STMT_END_F\n"
      pos += 120; sec += 1
    }
    hdr("Write_rows")
    txt ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
    txt ++= "###   @1=1 /* INT */\n###   @2='a' /* VARSTRING(160) */\n###   @3=1.5 /* DOUBLE */\n"
    hdr("Update_rows")
    txt ++= "### UPDATE `testdb`.`t_pk`\n### WHERE\n"
    txt ++= "###   @1=1 /* INT */\n###   @2='a' /* VARSTRING(160) */\n###   @3=1.5 /* DOUBLE */\n"
    txt ++= "### SET\n"
    txt ++= "###   @1=2 /* INT */\n###   @2='b' /* VARSTRING(160) */\n###   @3=2.5 /* DOUBLE */\n"
    hdr("Write_rows")
    txt ++= "### INSERT INTO `testdb`.`t_pk`\n### SET\n"
    txt ++= "###   @1=3 /* INT */\n###   @2='c' /* VARSTRING(160) */\n###   @3=NULL /* DOUBLE */\n"
    hdr("Delete_rows")
    txt ++= "### DELETE FROM `testdb`.`t_pk`\n### WHERE\n"
    txt ++= "###   @1=3 /* INT */\n###   @2='c' /* VARSTRING(160) */\n###   @3=NULL /* DOUBLE */\n"
    val p = graft.cdc.BinlogFixture.materialize("c20_pkmove", txt.result())
    val hist = CdcQueries.scd2History(
      CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p)))
      .collect().map(r => (r.getLong(2), r.getInt(3), r.getString(4),
        Option(r.getLong(7)).map(_ => r.getLong(7)),
        if (r.isNullAt(9)) None else Some(r.getLong(9)),
        r.getBoolean(10)))
      .sortBy(t => (t._1, t._2)).toSeq
    // seqs are 0-based emission ordinals within the file
    val seqs = hist.map(t => (t._1, t._2, t._3, t._5, t._6))
    assert(seqs == Seq(
      (1L, 1, "'a'", Some(1L), false), // closed by the 1→2 PK move
      (2L, 1, "'b'", None, true),      // current
      (3L, 1, "'c'", Some(3L), false)  // closed by the delete
    ), s"got $hist")
  }

  test("c20 SCD2 history reconciles with c9 state on the stress fixture") {
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val flat = CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p))
    val hist = CdcQueries.scd2History(flat).collect()
    // (a) per key, versions are numbered 1..n with at most one current
    val byKey = hist.groupBy(r => (r.getString(0), r.getString(1), r.getLong(2)))
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to vs.length), s"$k")
      assert(vs.count(_.getBoolean(10)) <= 1, s"$k has >1 current")
      // only the LAST version may be open; earlier ones all closed
      sorted.dropRight(1).foreach(v => assert(!v.getBoolean(10), s"$k"))
      // (b) timelines never overlap: to(i) <= from(i+1) as stamps
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val close = (a.getString(8), a.getLong(9))
          val open = (b.getString(6), b.getLong(7))
          assert(Ordering[(String, Long)].lteq(close, open), s"$k overlap")
        case _ =>
      }
    }
    // (c) the current versions ARE c9's live state, row for row
    val current = hist.filter(_.getBoolean(10))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getString(4)), Option(r.getString(5)))).toSet
    val live = CdcQueries.materializeFromFlat(flat).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    assert(current == live)
  }

  test("c20 SCD2 differential fuzz: random op streams match a sequential replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(0)
    for (seed <- 1 to 3) {
      rnd.setSeed(seed * 1000L)
      // random inserts / updates (some PK-moving) / deletes over a
      // small key domain, valid-by-construction (updates/deletes touch
      // live rows; re-inserting a live id is allowed — SCD2 just opens
      // the next version)
      var live = Set.empty[Long]
      val evs = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, String, Option[String], Option[String],
          Option[String], Option[String])]
      var seq = 0L
      for (_ <- 1 to 400) {
        val op = rnd.nextInt(3)
        if (op == 0 || live.isEmpty) {
          val id = rnd.nextInt(40).toLong
          evs += (("f0", seq, "insert", None, Some(id.toString),
            Some(s"v$seq"), Some(s"w$seq")))
          live += id
        } else if (op == 1) {
          val id = live.toSeq(rnd.nextInt(live.size))
          val nid = if (rnd.nextInt(4) == 0) rnd.nextInt(40).toLong else id
          evs += (("f0", seq, "update", Some(id.toString), Some(nid.toString),
            Some(s"v$seq"), Some(s"w$seq")))
          live -= id; live += nid
        } else {
          val id = live.toSeq(rnd.nextInt(live.size))
          evs += (("f0", seq, "delete", Some(id.toString), None, None, None))
          live -= id
        }
        seq += 1
      }
      val flat = evs.toSeq
        .toDF("file", "seq", "op", "before_id", "after_id",
          "after_c2", "after_c3")
        .withColumn("db", lit("fuzzdb")).withColumn("table", lit("t"))
      val got = CdcQueries.scd2History(flat).collect()
        .map(r => (r.getLong(2), r.getInt(3), r.getString(4), r.getString(5),
          r.getLong(7), if (r.isNullAt(9)) None else Some(r.getLong(9)),
          r.getBoolean(10))).toSet
      // independent model: ONE chronological pass with a mutable
      // open-version map — tombstone closes, upsert closes-then-opens
      case class Open(ver: Int, c2: String, c3: String, from: Long)
      var open = Map.empty[Long, Open]
      var vers = Map.empty[Long, Int]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Int, String, String, Long, Option[Long], Boolean)]
      def close(id: Long, at: Long): Unit = open.get(id).foreach { o =>
        out += ((id, o.ver, o.c2, o.c3, o.from, Some(at), false))
        open -= id
      }
      for ((_, s, op, bid, aid, c2, c3) <- evs) {
        if (op == "update" || op == "delete") close(bid.get.toLong, s)
        if (op == "insert" || op == "update") {
          val id = aid.get.toLong
          close(id, s) // re-insert / self-update closes the open version
          val v = vers.getOrElse(id, 0) + 1
          vers += id -> v
          open += id -> Open(v, c2.get, c3.get, s)
        }
      }
      open.foreach { case (id, o) =>
        out += ((id, o.ver, o.c2, o.c3, o.from, None, true))
      }
      assert(got == out.toSet, s"seed=$seed")
    }
  }

  test("c22 time travel: AS-OF reads over the history equal replay-to-position at every cutoff") {
    import org.apache.spark.sql.functions._
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val flat = CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p))
    val hist = CdcQueries.scd2History(flat).localCheckpoint()
    val files = flat.select("file").distinct()
      .collect().map(_.getString(0)).sorted
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    for (pf <- files; ps <- Seq(0L, 123L, 750L, 1400L, 5000L)) {
      val asOf = canon(CdcQueries.scd2AsOf(hist, lit(pf), lit(ps)))
      val replay = canon(CdcQueries.materializeFromFlat(
        flat.filter(col("file") < pf ||
          (col("file") === pf && col("seq") <= ps))))
      assert(asOf == replay, s"cutoff=($pf, $ps)")
    }
  }

  test("c21 incremental SCD2: per-file folds equal batch c20, state bounded by live keys") {
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val files = new java.io.File(p).listFiles.map(_.getAbsolutePath).sorted
    def flatOf(f: String) =
      CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, f))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val full = CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p))
    val batch = canon(CdcQueries.scd2History(full))
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var closedSets = Seq.empty[Set[Seq[Any]]]
    var closed: Option[org.apache.spark.sql.DataFrame] = None
    files.foreach { f =>
      val (ns, cl) = CdcQueries.scd2Merge(state, flatOf(f))
      state = Some(ns.localCheckpoint())
      closed = Some(closed.map(_.unionByName(cl)).getOrElse(cl).localCheckpoint())
      closedSets :+= canon(closed.get)
    }
    val streamed = canon(closed.get.unionByName(CdcQueries.scd2View(state.get)))
    assert(streamed == batch)
    // closed rows are append-only: each batch's set contains the last
    closedSets.sliding(2).foreach {
      case Seq(a, b) => assert(a.subsetOf(b))
      case _ =>
    }
    // state is bounded by LIVE keys (c9's live rows), not log length
    val liveKeys = CdcQueries.materializeFromFlat(full).count()
    assert(state.get.count() == liveKeys,
      s"state=${state.get.count()} live=$liveKeys")
  }

  test("c10 incremental merge: per-file folds equal batch c9, in ANY file order") {
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val files = new java.io.File(p).listFiles.map(_.getAbsolutePath).sorted
    assert(files.length == 2)
    def flatOf(f: String) =
      CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, f))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val batch = canon(CdcQueries.materializeFromFlat(
      CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p))))
    for (order <- Seq(files.toSeq, files.reverse.toSeq)) {
      var state: Option[org.apache.spark.sql.DataFrame] = None
      order.foreach { f =>
        state = Some(CdcQueries.mergeState(state, flatOf(f)).localCheckpoint())
      }
      assert(canon(CdcQueries.stateView(state.get)) == batch,
        s"order=${order.map(_.split('/').last)}")
    }
  }

  test("c9 state materialization: differential vs in-memory log replay") {
    val sf = "/root/testdata/sf0.001"
    val got = CdcQueries.defs.find(_.name == "c9_state_materialize").get
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    // independent replay: sort flattened events by (file, seq), apply
    // tombstone-then-upsert per event into a mutable map
    val p = graft.cdc.BinlogFixture.materializeDir(
      "stress_v1", 2, 1500, graft.cdc.BinlogFixture.stressStream)
    val flat = CdcQueries.flattenImages(graft.cdc.CdcJob.parse(spark, p))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getString(4),
        Option(r.getString(5)), Option(r.getString(6)),
        Option(r.getString(7)), Option(r.getString(8))))
      .sortBy(t => (t._1, t._2))
    val state = scala.collection.mutable.Map
      .empty[(String, String, Long), (Option[String], Option[String])]
    flat.foreach { case (_, _, db, table, bid, aid, c2, c3) =>
      bid.foreach(b => state.remove((db, table, b.toLong)))
      aid.foreach(a => state((db, table, a.toLong)) = (c2, c3))
    }
    val want = state.map { case ((db, t, id), (c2, c3)) => (db, t, id, c2, c3) }.toSet
    assert(got == want, s"got=${got.size} want=${want.size}")
  }
}
