package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque BINARY columns
  * with typed metadata, decode / feature-extract / resize /
  * frame-sample stages.
  *
  * Two tiers. m4 is a GENUINE image path: real PNG bytes encoded and
  * decoded with `javax.imageio` (on every JVM) inside the executor
  * kernel — pixels in, compressed binary on the wire, pixels back
  * out. For formats whose codecs this container lacks (JPEG is
  * present too, but audio/video are not), the m1–m3 decode kernels
  * remain clearly-marked deterministic stubs (byte histogram standing
  * in for "decoded features"); everything around them — schema,
  * binary column handling, per-partition batch shape, frame chunking,
  * partitioning — is the same real plumbing m4 exercises end-to-end.
  */
object MultimodalOps {

  /** Synthesize a media table from the documents corpus: payload bytes
    * (stand-in for encoded image/video), typed metadata struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          pmod(col("doc_id"), lit(3)).cast("int").as("kind"), // 0 img,1 audio,2 video
          (lit(64) + pmod(col("doc_id"), lit(8)) * 16).cast("int").as("width"),
          (lit(64) + pmod(col("doc_id"), lit(4)) * 16).cast("int").as("height"),
          length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"))

  /** Typed media metadata — mirrors mediaTable's meta struct. */
  final case class MediaMeta(kind: Int, width: Int, height: Int, n_bytes: Int)

  /** STUB decode kernel: a real codec would decode `payload` here; the
    * stand-in emits a deterministic 16-bin byte histogram, L1-normed.
    * Runs as a typed map over raw payload bytes — the exact shape a
    * JNI/codec binding takes (bytes in, feature vector out, one call
    * per row inside a JIT'd partition loop); swapping the histogram
    * for a decoder changes only the loop body. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .map { case (id, payload, meta) =>
        val counts = new Array[Int](16)
        var i = 0
        while (i < payload.length) {
          counts(payload(i) & 0x0F) += 1
          i += 1
        }
        val feature = new Array[Float](16)
        if (payload.length > 0) {
          i = 0
          while (i < 16) {
            feature(i) = (counts(i) / payload.length.toDouble).toFloat
            i += 1
          }
        }
        (id, meta, feature)
      }
      .toDF("media_id", "meta", "feature")
  }

  /** STUB resize kernel for "image" payloads: nearest-neighbor index
    * resample of the payload viewed as a meta.width × meta.height
    * byte grid down to outW × outH (source index out of range → 0).
    * A real image resize swaps the per-pixel lookup for a decoded-
    * pixel interpolation; the plumbing — binary in, typed dims,
    * binary out, one JIT'd kernel call per row — is identical. */
  def resizeMedia(media: DataFrame, outW: Int = 32, outH: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("meta.kind") === 0 && length(col("payload")) > 0)
      .select(col("media_id"), col("payload"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .map { case (id, payload, meta) =>
        val out = new Array[Byte](outW * outH)
        var i = 0
        while (i < out.length) {
          val srcIdx = (i / outW) * meta.height / outH * meta.width +
            (i % outW) * meta.width / outW
          out(i) = if (srcIdx < payload.length) payload(srcIdx) else 0
          i += 1
        }
        (id, outW, outH, out)
      }
      .toDF("media_id", "out_w", "out_h", "out_payload")
  }

  /** Frame sampling for "video" payloads: chunk the payload into
    * fixed-size frames, keep every `stride`-th frame — the flatMap
    * that feeds per-frame feature extraction at scale, emitting
    * primitive rows from a typed kernel (the HOF form interpreted a
    * struct constructor plus a binary substring per frame). */
  def frameSample(media: DataFrame, frameBytes: Int = 64,
      stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("meta.kind") === 2 && length(col("payload")) > 0)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val n = payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames, stride).map { i =>
          (id, i, math.min(frameBytes, n - i * frameBytes))
        }
      }
      .toDF("media_id", "frame_idx", "frame_len")
  }

  /** REAL image decode, end to end: render each document's first
    * w×h bytes as an 8-bit grayscale image, ENCODE it to actual PNG
    * bytes and DECODE it back with `javax.imageio` — both inside one
    * executor-side kernel — then derive features (pixel sum) and a
    * nearest-neighbor 2× downsample (resampled pixel sum) from the
    * DECODED raster. PNG is lossless on 8-bit gray, so the decoded
    * features are a pure function of the source bytes: the DuckDB
    * oracle recomputes them from `text` directly, which makes a
    * hash-match verify the real codec round-trip, not byte math.
    *
    * Scale shape: one narrow typed partition loop (no shuffle until
    * the output sort), codec objects per call as `ImageIO` requires,
    * file-cache off so executors never touch local disk for scratch.
    * A 100 TB corpus of real images runs THIS kernel with the
    * synthesis step dropped — decode, feature, resample are already
    * the production operators. */
  def pngRoundtrip(docs: DataFrame, w: Int = 16, h: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no disk scratch in executors
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val px = new Array[Byte](w * h) // zero-padded beyond the text
          System.arraycopy(bytes, 0, px, 0, math.min(bytes.length, px.length))
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setDataElements(0, 0, w, h, px)
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          val png = baos.toByteArray
          val dec = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          val dw = dec.getWidth
          val dh = dec.getHeight
          // getSamples is raster-layout-agnostic (robust to the reader
          // returning a different BufferedImage type than it wrote)
          val out = dec.getRaster.getSamples(0, 0, dw, dh, 0,
            new Array[Int](dw * dh))
          var pxSum = 0L
          var i = 0
          while (i < out.length) { pxSum += out(i); i += 1 }
          var rzSum = 0L
          var y = 0
          while (y < dh / 2) {
            var x = 0
            while (x < dw / 2) { rzSum += out(y * 2 * dw + x * 2); x += 1 }
            y += 1
          }
          (id, dw, dh, pxSum, rzSum)
        }
      }
      .toDF("media_id", "w", "h", "px_sum", "rz_sum")
  }

  val defs: Seq[QueryDef] = Seq(

    // The stub decode kernel is deterministic byte math, so it has a
    // real DuckDB oracle: the low hex nibble of each payload byte IS
    // the 16-bin histogram bucket (regexp strips high nibbles from
    // hex(blob); replace-and-count gives per-bin frequencies).
    QueryDef("m1_media_features",
      """WITH h AS (
        |  SELECT doc_id, regexp_replace(hex(encode(text)), '(.)(.)', '\2', 'g') AS nib,
        |         octet_length(encode(text)) AS n
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n,
        |         [CAST((length(nib) - length(replace(nib, substr('0123456789ABCDEF', x+1, 1), ''))) * 1.0 / n AS FLOAT) for x in range(16)] AS f
        |  FROM h)
        |SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS kind, CAST(n AS INT) AS n_bytes,
        |       ROUND(list_sum([CAST(y AS DOUBLE) for y in f]), 3) AS feat_sum,
        |       ROUND(CAST(f[1] AS DOUBLE), 5) AS f0
        |FROM b ORDER BY media_id""".stripMargin) { (s, d) =>
      decodeFeatures(mediaTable(s, d))
        .select(col("media_id"), col("meta.kind").as("kind"),
          col("meta.n_bytes").as("n_bytes"),
          round(expr("aggregate(feature, 0D, (a, x) -> a + x)"), 3).as("feat_sum"),
          round(element_at(col("feature"), 1).cast("double"), 5).as("f0"))
        .orderedRows(col("media_id")) // one row per media item: scales
    },

    QueryDef("m2_frame_sample",
      """WITH v AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        |  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0)
        |SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
        |       CAST(LEAST(64, n - i*64) AS INT) AS frame_len
        |FROM v, UNNEST(range(0, CAST(ceil(n/64.0) AS BIGINT), 2)) AS t(i)
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      frameSample(mediaTable(s, d))
        .orderedRows(col("media_id"), col("frame_idx")) // frames scale with corpus
    },

    // Driver-facing projection keeps scalars only (binary columns, like
    // arrays, break order-canonicalizing result harnesses): the resized
    // payload is verified through its length and byte sum, both
    // reproduced exactly by the hex-arithmetic oracle.
    QueryDef("m3_resize",
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(64 + (doc_id % 8) * 16 AS BIGINT) AS w,
        |         CAST(64 + (doc_id % 4) * 16 AS BIGINT) AS h,
        |         hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 0 AND octet_length(encode(text)) > 0)
        |SELECT media_id, CAST(32 AS INT) AS out_w, CAST(32 AS INT) AS out_h,
        |       CAST(1024 AS INT) AS out_len,
        |  CAST(list_sum([
        |    CASE WHEN ((i//32)*h//32)*w + ((i%32)*w//32) < n THEN
        |      CAST(strpos('0123456789ABCDEF', substr(hx, CAST((((i//32)*h//32)*w + ((i%32)*w//32))*2+1 AS INT), 1)) - 1 AS BIGINT) * 16
        |      + (strpos('0123456789ABCDEF', substr(hx, CAST((((i//32)*h//32)*w + ((i%32)*w//32))*2+2 AS INT), 1)) - 1)
        |    ELSE 0 END
        |    for i in range(1024)]) AS BIGINT) AS byte_sum
        |FROM m ORDER BY media_id""".stripMargin) { (s, d) =>
      import s.implicits._
      resizeMedia(mediaTable(s, d))
        .as[(Long, Int, Int, Array[Byte])]
        .map { case (id, w, h, p) =>
          var sum = 0L
          var i = 0
          while (i < p.length) { sum += (p(i) & 0xFF); i += 1 }
          (id, w, h, p.length, sum)
        }
        .toDF("media_id", "out_w", "out_h", "out_len", "byte_sum")
        .orderedRows(col("media_id")) // one row per image: scales
    },

    // Real PNG encode→decode→feature/resample round-trip. PNG is
    // lossless on 8-bit gray, so the oracle reproduces the DECODED
    // pixel sums straight from the source bytes (hex arithmetic, as
    // m3): a hash match here certifies the actual ImageIO codec path.
    QueryDef("m4_png_roundtrip",
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT media_id, CAST(16 AS INT) AS w, CAST(16 AS INT) AS h,
        |  CAST(list_sum([
        |    CASE WHEN i < n THEN
        |      (strpos('0123456789ABCDEF', substr(hx, i*2+1, 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substr(hx, i*2+2, 1)) - 1)
        |    ELSE 0 END for i in range(256)]) AS BIGINT) AS px_sum,
        |  CAST(list_sum([
        |    CASE WHEN (i//8)*32 + (i%8)*2 < n THEN
        |      (strpos('0123456789ABCDEF', substr(hx, ((i//8)*32 + (i%8)*2)*2+1, 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substr(hx, ((i//8)*32 + (i%8)*2)*2+2, 1)) - 1)
        |    ELSE 0 END for i in range(64)]) AS BIGINT) AS rz_sum
        |FROM m ORDER BY media_id""".stripMargin) { (s, d) =>
      pngRoundtrip(Tables.documents(s, d))
        .orderedRows(col("media_id")) // one row per image: scales
    }
  )
}
