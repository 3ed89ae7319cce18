package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.SmallOrdered
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque BINARY columns
  * with typed metadata, decode / feature-extract / resize /
  * frame-sample stages.
  *
  * Two tiers. The IMAGE path (kind 0) is GENUINE end to end: the
  * media table carries real PNG bytes (encoded from the document
  * corpus with `javax.imageio`, present on every JVM), and m1/m3/m4
  * DECODE those bytes in their executor kernels — pixel histogram,
  * pixel resample, round-trip features all computed from the decoded
  * raster. PNG is lossless on 8-bit gray, so the DuckDB oracles
  * recompute each result from the SOURCE bytes: a hash match
  * certifies the actual codec path, not byte math. For formats whose
  * codecs this container lacks (audio kind 1, video kind 2), the
  * decode kernels remain clearly-marked deterministic stubs (byte
  * histogram standing in for "decoded features"); everything around
  * them — schema, binary column handling, per-partition batch shape,
  * frame chunking, partitioning — is the same real plumbing the image
  * path exercises with a live codec.
  */
object MultimodalOps {

  /** Image-kind raster dims: every kind-0 payload is a real PNG of the
    * document's first ImgW×ImgH UTF-8 bytes (zero-padded). */
  private val ImgW = 16
  private val ImgH = 16

  /** Encode a w×h 8-bit grayscale raster to real PNG bytes. Call
    * `ImageIO.setUseCache(false)` once per partition first — executors
    * must not touch local disk for codec scratch. */
  private[queries] def encodeGrayPng(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode PNG bytes to (width, height, gray samples 0..255).
    * getSamples is raster-layout-agnostic (robust to the reader
    * returning a different BufferedImage type than was written).
    * ImageIO signals an unrecognized container by returning null, not
    * throwing — turn that into a diagnosable failure (`ctx` names the
    * offending row) instead of an anonymous NPE deep in a big job;
    * callers hit it on truncated/corrupt payloads or on kind-0 rows
    * built with `mediaTable(imagePayloads = false)`. */
  private[queries] def decodeGrayPng(
      png: Array[Byte], ctx: String = ""): (Int, Int, Array[Int]) = {
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    if (dec == null) throw new IllegalArgumentException(
      s"${ctx}undecodable image payload (${png.length} bytes): ImageIO " +
        "found no reader — image-kind rows must carry real image bytes " +
        "(mediaTable(imagePayloads = true))")
    val w = dec.getWidth
    val h = dec.getHeight
    (w, h, dec.getRaster.getSamples(0, 0, w, h, 0, new Array[Int](w * h)))
  }

  /** Typed media metadata — mirrors mediaTable's meta struct. For
    * images n_bytes is the DECODED raster size (ImgW×ImgH — the
    * payload's PNG byte length is codec-dependent and deliberately not
    * part of the contract); for stub kinds it is the payload length. */
  final case class MediaMeta(kind: Int, width: Int, height: Int, n_bytes: Int)

  /** Synthesize a media table from the documents corpus. Kind 0
    * (image): payload is a REAL PNG — the document's first ImgW×ImgH
    * bytes rendered as an 8-bit gray raster and encoded with ImageIO
    * in the executor kernel. Kinds 1/2 (audio/video — no JVM codecs):
    * payload is the raw bytes, metadata synthetic, downstream kernels
    * stubbed. `imagePayloads = false` skips the PNG encode (kind-0
    * rows keep raw bytes): consumers that filter images OUT (m2's
    * kind-2 path) must not pay the codec for rows they drop — the
    * kind filter cannot push through the opaque kernel. */
  def mediaTable(spark: SparkSession, dir: String,
      imagePayloads: Boolean = true): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .fanOut // single-row-group scan: spread the PNG-encode kernel
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val kind = (id % 3).toInt
          if (kind == 0 && imagePayloads) {
            val px = new Array[Byte](ImgW * ImgH) // zero-padded raster
            System.arraycopy(bytes, 0, px, 0, math.min(bytes.length, px.length))
            (id, encodeGrayPng(px, ImgW, ImgH), MediaMeta(0, ImgW, ImgH, px.length))
          } else {
            (id, bytes, MediaMeta(kind,
              64 + (id % 8).toInt * 16, 64 + (id % 4).toInt * 16, bytes.length))
          }
        }
      }
      .toDF("media_id", "payload", "meta")
  }

  /** Decode kernel. Images (kind 0): REAL decode — ImageIO reads the
    * PNG payload and the 16-bin histogram is over the DECODED pixels'
    * intensity (pixel >> 4), L1-normed by raster size. Stub kinds
    * (audio/video, no JVM codec): deterministic low-nibble byte
    * histogram over the raw payload — the exact shape a codec binding
    * takes (bytes in, feature vector out, one call per row inside a
    * JIT'd partition loop); swapping the histogram for a decoder
    * changes only the loop body, as the image branch demonstrates. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload, meta) =>
          val feature = new Array[Float](16)
          def intensityHist(px: Array[Int]): Unit = {
            val counts = new Array[Int](16)
            var i = 0
            while (i < px.length) { counts(px(i) >> 4) += 1; i += 1 }
            i = 0
            while (i < 16) {
              feature(i) = (counts(i) / px.length.toDouble).toFloat
              i += 1
            }
          }
          if (meta.kind == 0) {
            val (_, _, px) = decodeGrayPng(payload, s"media_id=$id: ")
            intensityHist(px)
          } else {
            // lossy kinds (audio/video — no JVM codec): consult the
            // MediaDecoder SPI first. A mounted decoder (ffmpeg-backed
            // provider on the executor classpath) yields a REAL
            // decoded-intensity histogram; with none registered — or
            // when the claimant cannot decode this payload — the
            // deterministic low-nibble byte histogram stands in, so
            // committed hashes only change when a decoder is present.
            graft.functions.MediaDecoders.rasterOf(meta.kind, payload) match {
              case Some((_, _, px)) if px.length > 0 => intensityHist(px)
              case _ if payload.length > 0 =>
                val counts = new Array[Int](16)
                var i = 0
                while (i < payload.length) { counts(payload(i) & 0x0F) += 1; i += 1 }
                i = 0
                while (i < 16) {
                  feature(i) = (counts(i) / payload.length.toDouble).toFloat
                  i += 1
                }
              case _ => ()
            }
          }
          (id, meta, feature)
        }
      }
      .toDF("media_id", "meta", "feature")
  }

  /** REAL image resize: decode the PNG payload and nearest-neighbor
    * resample the DECODED raster down to outW × outH. Binary in,
    * typed dims, binary out, one JIT'd kernel call per row — the
    * production operator for an image corpus (only the upstream
    * synthesis step is bench scaffolding). */
  def resizeMedia(media: DataFrame, outW: Int = 12, outH: Int = 12): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("meta.kind") === 0)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val (w, h, px) = decodeGrayPng(payload, s"media_id=$id: ")
          val out = new Array[Byte](outW * outH)
          var i = 0
          while (i < out.length) {
            out(i) = px((i / outW) * h / outH * w + (i % outW) * w / outW).toByte
            i += 1
          }
          (id, outW, outH, out)
        }
      }
      .toDF("media_id", "out_w", "out_h", "out_payload")
  }

  /** Perceptual-hash (dHash) image near-dup pairs — the image-side
    * sibling of d2's SimHash text dedup, composed with the REAL codec
    * path: decode the PNG payload, nearest-neighbor-resample the
    * decoded raster to a 9×8 grid, set bit y·8+x iff
    * grid(x,y) > grid(x+1,y) (the row-wise brightness gradient —
    * invariant to uniform brightness shifts), then pair images at
    * Hamming ≤ maxDist via the 16-bit chunk pigeonhole (EXACT for
    * maxDist ≤ 3: ≤ 3 flipped bits leave one of the 4 chunks
    * untouched — candidate generation loses nothing). One kernel per
    * row computes decode + hash + chunk rows; the shuffle carries
    * (id, hash, chunk) rows only, the join emits candidates, and the
    * exact Hamming filter runs in-stream — sub-quadratic end-to-end,
    * with d2's skew story (a hot chunk value is the salting case). */
  def phashPairs(media: DataFrame, maxDist: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val chunked = media.filter(col("meta.kind") === 0)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, payload) =>
          val (w, h, px) = decodeGrayPng(payload, s"media_id=$id: ")
          // 9×8 nearest-neighbor sample of the decoded raster; the
          // index arithmetic is m3's (and the oracle recomputes it
          // from source bytes via PNG losslessness)
          val r = new Array[Int](72)
          var i = 0
          while (i < 72) {
            r(i) = px((i / 9) * h / 8 * w + (i % 9) * w / 9)
            i += 1
          }
          var hash = 0L
          var b = 0
          while (b < 64) {
            if (r((b / 8) * 9 + b % 8) > r((b / 8) * 9 + b % 8 + 1))
              hash |= 1L << b
            b += 1
          }
          Iterator.tabulate(4)(c => (id, hash, c, (hash >>> (c * 16)) & 0xFFFFL))
        }
      }
      .toDF("media_id", "phash", "c", "v")
    chunked.as("x").join(chunked.as("y").hint("shuffle_hash"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("ia"), col("y.media_id").as("ib"),
        col("x.phash").as("ha"), col("y.phash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxDist)
      .select("ia", "ib", "hamming")
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

  /** Image round-trip in ONE kernel: render each document's first
    * w×h bytes as an 8-bit grayscale image, ENCODE to PNG and DECODE
    * back, then derive features (pixel sum) and a nearest-neighbor 2×
    * downsample (resampled pixel sum) from the DECODED raster —
    * certifying encode and decode against each other within a single
    * pass (m1/m3 exercise the same codec across the payload column
    * seam). Scale shape: one narrow typed partition loop, no shuffle
    * until the output sort. */
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
          val (dw, dh, out) = decodeGrayPng(encodeGrayPng(px, w, h))
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

  private val MediaSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_media_snapshot"
  private val mediaSnapshotSf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** m7's (media_id, payload) WAV snapshot for the DuckDB re-parse. */
  private val WavSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_wav_snapshot"

  /** Encode 16-bit PCM as a REAL RIFF/WAVE container: RIFF size
    * header, optional odd-sized LIST chunk (exercising the RIFF
    * even-byte padding rule), canonical 16-byte `fmt ` chunk
    * (PCM format 1), LE `data` chunk. `truncateBytes` drops the tail
    * AFTER sizes are written — the classic interrupted-upload shape
    * whose declared data length exceeds the file. */
  private[queries] def encodeWav(samples: Array[Short], rate: Int,
      channels: Int, listChunk: Boolean, truncateBytes: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = { var i = 0
      while (i < 4) { out.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
    val dataLen = samples.length * 2
    val listLen = if (listChunk) 8 + 7 + 1 else 0 // odd size + pad byte
    ascii("RIFF"); u32(4L + listLen + 24 + 8 + dataLen); ascii("WAVE")
    if (listChunk) { ascii("LIST"); u32(7L); ascii("INFOxyz"); out.write(0) }
    ascii("fmt "); u32(16L)
    u16(1); u16(channels); u32(rate.toLong)
    u32(rate.toLong * channels * 2); u16(channels * 2); u16(16)
    ascii("data"); u32(dataLen.toLong)
    samples.foreach(s => u16(s & 0xFFFF))
    val b = out.toByteArray
    if (truncateBytes > 0) java.util.Arrays.copyOf(b, b.length - truncateBytes)
    else b
  }

  /** Deterministic PCM WAV corpus from the documents table — the
    * audio twin of [[mediaTable]]'s PNG path, REAL at the container/
    * sample level (RIFF walk + PCM16 decode need no codec; compressed
    * audio stays out of scope — no JVM codec exists here). Rates,
    * channel counts, lengths, LIST-chunk presence, and a truncated
    * minority all vary by doc_id so the parser's branches all carry
    * corpus rows. */
  def wavTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 1) // the media table's audio kind
      .select(col("doc_id"), col("text"))
      .fanOut
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val channels = if (id % 5 == 0) 2 else 1
          val rate = Array(8000, 16000, 44100)(((id / 3) % 3).toInt)
          val nFrames = 200 + ((id / 3) % 10).toInt * 50
          val n = nFrames * channels
          val samples = Array.tabulate(n) { i =>
            val b = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xFF
            (((b - 128) * 241) + ((i * 31) % 128)).toShort
          }
          (id, encodeWav(samples, rate, channels,
            listChunk = id % 4 == 1,
            truncateBytes = if (id % 17 == 0) 16 else 0))
        }
      }
      .toDF("media_id", "payload")
  }

  /** m9's (media_id, payload) AVI snapshot for the DuckDB re-parse. */
  private val AviSnapshot =
    System.getProperty("java.io.tmpdir") + "/graft_avi_snapshot"

  /** Encode a minimal REAL AVI container: RIFF('AVI ') → LIST(hdrl)
    * holding the canonical 56-byte `avih` main header → LIST(movi)
    * holding the frame chunks ('00dc', caller-supplied payloads of
    * variable odd/even sizes so the RIFF pad rule is exercised) →
    * `idx1` index stub. `declaredFrames` may differ from the chunks
    * actually written (interrupted write — the audit case). */
  private[queries] def encodeAvi(usPerFrame: Int, width: Int, height: Int,
      frames: Seq[Array[Byte]], declaredFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit = { var i = 0
      while (i < 4) { out.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
    def chunkLen(sz: Int): Int = 8 + sz + (sz % 2)
    val avihLen = chunkLen(56)
    val hdrlLen = 4 + avihLen
    val moviLen = 4 + frames.map(f => chunkLen(f.length)).sum
    val idxLen = chunkLen(16 * frames.length)
    ascii("RIFF"); u32(4L + (8 + hdrlLen) + (8 + moviLen) + idxLen); ascii("AVI ")
    ascii("LIST"); u32(hdrlLen.toLong); ascii("hdrl")
    ascii("avih"); u32(56L)
    u32(usPerFrame.toLong); u32(width.toLong * height * 4) // maxBytesPerSec
    u32(0L); u32(0x10L) // padding, flags (HASINDEX)
    u32(declaredFrames.toLong); u32(0L); u32(1L); u32(0L) // frames, initial, streams, sugBuf
    u32(width.toLong); u32(height.toLong)
    (0 until 4).foreach(_ => u32(0L)) // reserved
    ascii("LIST"); u32(moviLen.toLong); ascii("movi")
    frames.foreach { f =>
      ascii("00dc"); u32(f.length.toLong)
      out.write(f, 0, f.length)
      if (f.length % 2 == 1) out.write(0) // RIFF pad
    }
    ascii("idx1"); u32(16L * frames.length)
    frames.indices.foreach { i =>
      ascii("00dc"); u32(0x10L); u32(0L); u32(frames(i).length.toLong) }
    out.toByteArray
  }

  /** Deterministic AVI corpus from the documents table — the video
    * twin of [[wavTable]]: REAL at the container level (RIFF framing,
    * avih header, frame-chunk census; the frame PAYLOADS stay opaque —
    * decoding them needs a video codec this JVM lacks). */
  def aviTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 2) // the media table's video kind
      .select(col("doc_id"), col("text"))
      .fanOut
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val usPerFrame = Array(33333, 40000, 16667)(((id / 3) % 3).toInt)
          val nFrames = 5 + ((id / 3) % 12).toInt * 2
          val sizes = Seq.tabulate(nFrames) { i =>
            val b = if (bytes.isEmpty) 7 else bytes(i % bytes.length) & 0x3F
            17 + b // odd AND even sizes both occur
          }
          // a minority of interrupted writes: header declares more
          // frames than the movi list carries
          val declared = if (id % 19 == 0) nFrames + 3 else nFrames
          val frames = sizes.zipWithIndex.map { case (sz, i) =>
            Array.tabulate(sz)(k => ((i * 31 + k * 7) & 0xFF).toByte) }
          (id, encodeAvi(usPerFrame, 64 + (id % 8).toInt * 16,
            48 + (id % 4).toInt * 16, frames, declared))
        }
      }
      .toDF("media_id", "payload")
  }

  /** m8's raster dims: every PNG frame is FrmW×FrmH 8-bit gray. */
  private val FrmW = 8
  private val FrmH = 8

  /** Video corpus with REAL coded frames: each movi chunk is a
    * complete PNG image (MJPEG-style intra-only coding, with PNG as
    * the per-frame codec since it is the one this JVM carries). Frame
    * f's raster is a pure function of the document text — pixel j =
    * text byte ((f·64 + j) mod n), zero for empty docs — which is
    * what lets the DuckDB oracle certify the DECODED pixels without a
    * SQL inflate: PNG is lossless, so re-deriving the raster from the
    * text equals decoding the frame, and any container-walk or codec
    * error breaks the hash. */
  def pngAviTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 2) // the media table's video kind
      .select(col("doc_id"), col("text"))
      .fanOut
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val usPerFrame = Array(33333, 40000, 16667)(((id / 3) % 3).toInt)
          val nFrames = 5 + ((id / 3) % 12).toInt * 2
          val frames = Seq.tabulate(nFrames) { f =>
            val px = new Array[Byte](FrmW * FrmH)
            if (bytes.nonEmpty) {
              var j = 0
              while (j < px.length) {
                px(j) = bytes((f * 64 + j) % bytes.length); j += 1
              }
            }
            encodeGrayPng(px, FrmW, FrmH)
          }
          (id, encodeAvi(usPerFrame, FrmW, FrmH, frames, nFrames))
        }
      }
      .toDF("media_id", "payload")
  }

  /** 8-bit gray JPEG encode via the JVM's own codec (javax.imageio) —
    * the real-world intra-only video coding m10 exercises. Lossy, so
    * nothing downstream may assume raster equality with the source. */
  private[queries] def encodeGrayJpeg(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos): Unit
    bos.toByteArray
  }

  /** Video corpus in the dominant real intra-only coding: every movi
    * chunk a complete JPEG (true MJPEG layout). Rasters follow m8's
    * text rule, then pass through the lossy codec — so correctness is
    * GOLDEN-pinned (deterministic per JVM codec) rather than
    * SQL-oracled, with the spec checking flat-block exactness and
    * bounded loss. A minority of containers carry one TRUNCATED frame
    * (id % 17 == 2): the decode-error audit case — a 100 TB media scan
    * must report a bad frame, never die on it or silently drop it. */
  def mjpegAviTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 2) // the media table's video kind
      .select(col("doc_id"), col("text"))
      .fanOut
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val usPerFrame = Array(33333, 40000, 16667)(((id / 3) % 3).toInt)
          val nFrames = 5 + ((id / 3) % 12).toInt * 2
          val frames0 = Seq.tabulate(nFrames) { f =>
            val px = new Array[Byte](FrmW * FrmH)
            if (bytes.nonEmpty) {
              var j = 0
              while (j < px.length) {
                px(j) = bytes((f * 64 + j) % bytes.length); j += 1
              }
            }
            encodeGrayJpeg(px, FrmW, FrmH)
          }
          // planted decode-error audit: frame 3 is on m10's every-3rd
          // sampling stride (nFrames ≥ 5 always), so the bad frame is
          // guaranteed to reach the decoder
          val frames = if (id % 17 == 2)
            frames0.updated(3, frames0(3).take(8)) else frames0
          (id, encodeAvi(usPerFrame, FrmW, FrmH, frames, frames.length))
        }
      }
      .toDF("media_id", "payload")
  }

  /** m10: every k-th MJPEG frame decoded through javax.imageio, with
    * the decode-error AUDIT path — a frame the codec rejects yields an
    * ok=false row (zeroed stats) instead of failing the task or
    * vanishing from the census. Same map-side walk/decode shape as m8. */
  def mjpegFrameFeatures(avis: DataFrame, k: Int = 3): DataFrame = {
    val spark = avis.sparkSession
    import spark.implicits._
    avis.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, b) =>
          def u32(p: Int): Long = {
            var v = 0L; var i = 0
            while (i < 4) { v |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
            v
          }
          def tag(p: Int): String = new String(b, p, 4, "US-ASCII")
          val riff = b.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI "
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Int, Int, Int, Long, Long, Int, Int, Boolean)]
          if (riff) {
            var pos = 12L
            var fIdx = 0
            while (pos + 8 <= b.length) {
              val t = tag(pos.toInt)
              val len = u32(pos.toInt + 4)
              if (t == "LIST") pos += 12 // descend
              else {
                if (t == "00dc" && pos + 8 + len <= b.length) {
                  if (fIdx % k == 0) {
                    val jpg = java.util.Arrays.copyOfRange(
                      b, pos.toInt + 8, (pos + 8 + len).toInt)
                    val decoded =
                      try Option(javax.imageio.ImageIO.read(
                        new java.io.ByteArrayInputStream(jpg)))
                      catch { case _: java.io.IOException => None }
                    decoded match {
                      case Some(img) =>
                        val w = img.getWidth; val h = img.getHeight
                        val px = img.getRaster.getSamples(
                          0, 0, w, h, 0, new Array[Int](w * h))
                        var s = 0L; var sq = 0L
                        var mn = 255; var mx = 0
                        var i = 0
                        while (i < px.length) {
                          val v = px(i)
                          s += v; sq += v.toLong * v
                          if (v < mn) mn = v
                          if (v > mx) mx = v
                          i += 1
                        }
                        out += ((id, fIdx, w, h, s, sq, mn, mx, true))
                      case None =>
                        out += ((id, fIdx, 0, 0, 0L, 0L, 0, 0, false))
                    }
                  }
                  fIdx += 1
                }
                pos += 8 + len + (len % 2)
              }
            }
          }
          out.iterator
        }
      }
      .toDF("media_id", "frame_idx", "width", "height",
        "px_sum", "px_sq_sum", "px_min", "px_max", "ok")
  }

  /** Every k-th frame of each PNG-coded AVI, DECODED: the m6-style
    * container walk locates the '00dc' chunks, the m4 image codec
    * decodes each sampled frame, and the features are integer-exact
    * pixel statistics over the DECODED raster (sum, sum of squares,
    * min, max) — hashable cross-engine. One row-wise kernel, no
    * shuffle; frames beyond the container bound are ignored (the
    * walk, not the header, is the census). */
  def aviFrameFeatures(avis: DataFrame, k: Int = 3): DataFrame = {
    val spark = avis.sparkSession
    import spark.implicits._
    avis.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, b) =>
          def u32(p: Int): Long = {
            var v = 0L; var i = 0
            while (i < 4) { v |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
            v
          }
          def tag(p: Int): String = new String(b, p, 4, "US-ASCII")
          val riff = b.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI "
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Int, Int, Int, Long, Long, Int, Int)]
          if (riff) {
            var pos = 12L
            var fIdx = 0
            while (pos + 8 <= b.length) {
              val t = tag(pos.toInt)
              val len = u32(pos.toInt + 4)
              if (t == "LIST") pos += 12 // descend
              else {
                if (t == "00dc" && pos + 8 + len <= b.length) {
                  if (fIdx % k == 0) {
                    val png = java.util.Arrays.copyOfRange(
                      b, pos.toInt + 8, (pos + 8 + len).toInt)
                    val (w, h, px) = decodeGrayPng(png, s"media $id frame $fIdx: ")
                    var s = 0L; var sq = 0L
                    var mn = 255; var mx = 0
                    var i = 0
                    while (i < px.length) {
                      val v = px(i)
                      s += v; sq += v.toLong * v
                      if (v < mn) mn = v
                      if (v > mx) mx = v
                      i += 1
                    }
                    out += ((id, fIdx, w, h, s, sq, mn, mx))
                  }
                  fIdx += 1
                }
                pos += 8 + len + (len % 2)
              }
            }
          }
          out.iterator
        }
      }
      .toDF("media_id", "frame_idx", "width", "height",
        "px_sum", "px_sq_sum", "px_min", "px_max")
  }

  /** AVI container audit — RIFF walk DESCENDING into LIST chunks (a
    * LIST header is entered, 12 bytes, instead of skipped — visits
    * every nested chunk in order with no stack; identical rule in the
    * oracle), avih main-header fields, and a census of the movi frame
    * chunks ('00dc'/'01wb'): count + payload bytes. ok ⇔ well-formed
    * RIFF('AVI '), avih present, and the census matches the declared
    * frame count — the "interrupted upload" audit the ingest side
    * runs before paying any decode. */
  def aviMeta(avis: DataFrame): DataFrame = {
    val spark = avis.sparkSession
    import spark.implicits._
    avis.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          def u32(p: Int): Long = {
            var v = 0L; var i = 0
            while (i < 4) { v |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
            v
          }
          def tag(p: Int): String = new String(b, p, 4, "US-ASCII")
          val riff = b.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI "
          var avihPos = -1L
          var framesFound = 0L
          var frameBytes = 0L
          if (riff) {
            var pos = 12L
            while (pos + 8 <= b.length) {
              val t = tag(pos.toInt)
              val len = u32(pos.toInt + 4)
              if (t == "LIST") pos += 12 // descend
              else {
                if (t == "avih") avihPos = pos + 8
                if (t == "00dc" || t == "01wb") {
                  framesFound += 1; frameBytes += len
                }
                pos += 8 + len + (len % 2)
              }
            }
          }
          val avihOk = avihPos > 0 && avihPos + 56 <= b.length
          val (usf, streams, declared, w, h) =
            if (avihOk) (u32(avihPos.toInt), u32(avihPos.toInt + 24),
              u32(avihPos.toInt + 16), u32(avihPos.toInt + 32),
              u32(avihPos.toInt + 36))
            else (0L, 0L, -1L, 0L, 0L)
          val ok = riff && avihOk && usf > 0 && framesFound == declared
          (id, ok, usf, streams, w, h, declared, framesFound, frameBytes,
            if (ok) declared * usf / 1000L else 0L)
        }
      }
      .toDF("media_id", "ok", "us_per_frame", "n_streams", "width", "height",
        "declared_frames", "frames_found", "frame_bytes", "duration_ms")
  }

  /** RIFF/WAVE parse + PCM16 sample statistics — one row-wise kernel,
    * no shuffle. Walks the chunk list (honoring the RIFF even-byte
    * padding rule), reads the canonical fmt fields, and when the data
    * chunk is complete decodes the LE int16 samples for integer-exact
    * stats (peak magnitude + sum of squares — the energy measures; a
    * float RMS would not hash cross-engine). A malformed row (bad
    * magic, missing chunks, truncated data, non-PCM16) reports
    * ok=false with zeroed stats — exactly mirrored by the oracle. */
  def wavFeatures(wavs: DataFrame): DataFrame = {
    val spark = wavs.sparkSession
    import spark.implicits._
    wavs.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          def u16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
          def u32(p: Int): Long = (u16(p).toLong | (u16(p + 2).toLong << 16)) & 0xFFFFFFFFL
          def tag(p: Int): String = new String(b, p, 4, "US-ASCII")
          var fmtPos, dataPos = -1L
          var dataLen = -1L
          val riff = b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE"
          if (riff) {
            var pos = 12L
            while (pos + 8 <= b.length) {
              val t = tag(pos.toInt)
              val len = u32(pos.toInt + 4)
              if (t == "fmt ") fmtPos = pos + 8
              if (t == "data") { dataPos = pos + 8; dataLen = len }
              pos += 8 + len + (len % 2)
            }
          }
          // 16 fmt bytes must fit (0-based offsets; the oracle's
          // 1-based equivalent is fmt_pos + 15 <= n)
          val fmtOk = fmtPos > 0 && fmtPos + 16 <= b.length
          val (afmt, channels, rate, bits) =
            if (fmtOk) (u16(fmtPos.toInt), u16(fmtPos.toInt + 2),
              u32(fmtPos.toInt + 4), u16(fmtPos.toInt + 14))
            else (0, 0, 0L, 0)
          val ok = fmtOk && afmt == 1 && bits == 16 && channels > 0 &&
            rate > 0 && dataPos > 0 && dataLen >= 0 &&
            dataPos + dataLen <= b.length
          if (!ok) (id, false, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          else {
            val ns = (dataLen / 2).toInt
            var peak = 0L
            var sumsq = 0L
            var i = 0
            while (i < ns) {
              val s = u16(dataPos.toInt + 2 * i).toShort.toLong
              val a = math.abs(s)
              if (a > peak) peak = a
              sumsq += s * s
              i += 1
            }
            val frames = ns / channels
            (id, true, rate, channels.toLong, bits.toLong, ns.toLong,
              frames * 1000L / rate, peak, sumsq)
          }
        }
      }
      .toDF("media_id", "ok", "sample_rate", "channels", "bits",
        "n_samples", "duration_ms", "peak", "sumsq")
  }

  /** m7's DuckDB oracle: re-parse the WAV payload bytes — recursive
    * chunk walk with the RIFF even-byte pad rule, little-endian field
    * extraction via reversed hex pairs, signed-int16 PCM decode with
    * integer-exact peak / sum-of-squares. Mirrors `wavFeatures`' ok
    * predicate exactly (magic, fmt bounds, PCM16, data-fits). */
  private val WavOracleSql: String = {
    def pair(q: String) = s"substr(hx, CAST((($q)-1)*2+1 AS INT), 2)"
    def u16le(p: String) =
      s"CAST('0x' || ${pair(s"($p)+1")} || ${pair(p)} AS BIGINT)"
    def u32le(p: String) =
      s"CAST('0x' || ${pair(s"($p)+3")} || ${pair(s"($p)+2")} || " +
        s"${pair(s"($p)+1")} || ${pair(p)} AS BIGINT)"
    val sample = // sample i: lo byte at data_pos+2i, hi at +2i+1 (1-based)
      s"((CAST('0x' || ${pair("data_pos+2*i+1")} || ${pair("data_pos+2*i")} " +
        "AS BIGINT) + 32768) % 65536) - 32768"
    s"""WITH RECURSIVE m AS (
       |  SELECT media_id, hex(payload) AS hx,
       |         CAST(octet_length(payload) AS BIGINT) AS n
       |  FROM read_parquet('$WavSnapshot/*.parquet')),
       |walk AS (
       |  SELECT media_id, hx, n, CAST(13 AS BIGINT) AS pos,
       |         CAST(0 AS BIGINT) AS fmt_pos, CAST(0 AS BIGINT) AS data_pos,
       |         CAST(-1 AS BIGINT) AS data_len
       |  FROM m WHERE n >= 12 AND substr(hx, 1, 8) = '52494646'
       |    AND substr(hx, 17, 8) = '57415645'
       |  UNION ALL
       |  SELECT media_id, hx, n, pos + 8 + len + (len % 2),
       |         CASE WHEN typ = '666D7420' THEN pos + 8 ELSE fmt_pos END,
       |         CASE WHEN typ = '64617461' THEN pos + 8 ELSE data_pos END,
       |         CASE WHEN typ = '64617461' THEN len ELSE data_len END
       |  FROM (SELECT media_id, hx, n, pos, fmt_pos, data_pos, data_len,
       |          substr(hx, CAST((pos-1)*2+1 AS INT), 8) AS typ,
       |          ${u32le("pos + 4")} AS len
       |        FROM walk WHERE pos + 8 <= n + 1)),
       |done AS (
       |  SELECT media_id, MAX_BY(fmt_pos, pos) AS fmt_pos,
       |         MAX_BY(data_pos, pos) AS data_pos,
       |         MAX_BY(data_len, pos) AS data_len
       |  FROM walk GROUP BY media_id),
       |flds AS (
       |  SELECT m.media_id, m.hx, m.n,
       |    COALESCE(d.fmt_pos, 0) AS fmt_pos,
       |    COALESCE(d.data_pos, 0) AS data_pos,
       |    COALESCE(d.data_len, -1) AS data_len,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u16le("d.fmt_pos")} ELSE 0 END AS afmt,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u16le("d.fmt_pos + 2")} ELSE 0 END AS channels,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u32le("d.fmt_pos + 4")} ELSE 0 END AS rate,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u16le("d.fmt_pos + 14")} ELSE 0 END AS bits
       |  FROM m LEFT JOIN done d USING (media_id)),
       |okc AS (
       |  SELECT *, (fmt_pos > 0 AND afmt = 1 AND bits = 16 AND channels > 0
       |             AND rate > 0 AND data_pos > 0 AND data_len >= 0
       |             AND data_pos + data_len - 1 <= n) AS ok
       |  FROM flds),
       |sam AS (
       |  SELECT media_id, ok, rate, channels, bits,
       |    CASE WHEN ok THEN data_len // 2 ELSE 0 END AS ns,
       |    CASE WHEN ok THEN list_transform(range(data_len // 2),
       |           i -> $sample)
       |         ELSE [] END AS ss
       |  FROM okc)
       |SELECT media_id, ok,
       |  CASE WHEN ok THEN rate ELSE 0 END AS sample_rate,
       |  CASE WHEN ok THEN channels ELSE 0 END AS channels,
       |  CASE WHEN ok THEN bits ELSE 0 END AS bits,
       |  CAST(ns AS BIGINT) AS n_samples,
       |  CASE WHEN ok THEN (ns // channels) * 1000 // rate ELSE 0 END AS duration_ms,
       |  CAST(COALESCE(list_max(list_transform(ss, x -> abs(x))), 0) AS BIGINT) AS peak,
       |  CAST(COALESCE(list_sum(list_transform(ss, x -> x * x)), 0) AS BIGINT) AS sumsq
       |FROM sam ORDER BY media_id""".stripMargin
  }

  /** m11's oracle: the m7 RIFF walk re-used verbatim, then the SAME
    * 2/3-rational linear interpolation over the decoded sample list —
    * scaled by up=2 so every resampled value is an exact integer
    * ((2−r)·s[k] + r·s[k+1] for source position i·3/2 = k + r/2) and
    * the whole output hash-matches without a single float. */
  private val WavResampleOracleSql: String = {
    def pair(q: String) = s"substr(hx, CAST((($q)-1)*2+1 AS INT), 2)"
    def u16le(p: String) =
      s"CAST('0x' || ${pair(s"($p)+1")} || ${pair(p)} AS BIGINT)"
    def u32le(p: String) =
      s"CAST('0x' || ${pair(s"($p)+3")} || ${pair(s"($p)+2")} || " +
        s"${pair(s"($p)+1")} || ${pair(p)} AS BIGINT)"
    val sample =
      s"((CAST('0x' || ${pair("data_pos+2*i+1")} || ${pair("data_pos+2*i")} " +
        "AS BIGINT) + 32768) % 65536) - 32768"
    s"""WITH RECURSIVE m AS (
       |  SELECT media_id, hex(payload) AS hx,
       |         CAST(octet_length(payload) AS BIGINT) AS n
       |  FROM read_parquet('$WavSnapshot/*.parquet')),
       |walk AS (
       |  SELECT media_id, hx, n, CAST(13 AS BIGINT) AS pos,
       |         CAST(0 AS BIGINT) AS fmt_pos, CAST(0 AS BIGINT) AS data_pos,
       |         CAST(-1 AS BIGINT) AS data_len
       |  FROM m WHERE n >= 12 AND substr(hx, 1, 8) = '52494646'
       |    AND substr(hx, 17, 8) = '57415645'
       |  UNION ALL
       |  SELECT media_id, hx, n, pos + 8 + len + (len % 2),
       |         CASE WHEN typ = '666D7420' THEN pos + 8 ELSE fmt_pos END,
       |         CASE WHEN typ = '64617461' THEN pos + 8 ELSE data_pos END,
       |         CASE WHEN typ = '64617461' THEN len ELSE data_len END
       |  FROM (SELECT media_id, hx, n, pos, fmt_pos, data_pos, data_len,
       |          substr(hx, CAST((pos-1)*2+1 AS INT), 8) AS typ,
       |          ${u32le("pos + 4")} AS len
       |        FROM walk WHERE pos + 8 <= n + 1)),
       |done AS (
       |  SELECT media_id, MAX_BY(fmt_pos, pos) AS fmt_pos,
       |         MAX_BY(data_pos, pos) AS data_pos,
       |         MAX_BY(data_len, pos) AS data_len
       |  FROM walk GROUP BY media_id),
       |flds AS (
       |  SELECT m.media_id, m.hx, m.n,
       |    COALESCE(d.fmt_pos, 0) AS fmt_pos,
       |    COALESCE(d.data_pos, 0) AS data_pos,
       |    COALESCE(d.data_len, -1) AS data_len,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u16le("d.fmt_pos")} ELSE 0 END AS afmt,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u16le("d.fmt_pos + 2")} ELSE 0 END AS channels,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u32le("d.fmt_pos + 4")} ELSE 0 END AS rate,
       |    CASE WHEN COALESCE(d.fmt_pos, 0) > 0 AND d.fmt_pos + 15 <= m.n
       |         THEN ${u16le("d.fmt_pos + 14")} ELSE 0 END AS bits
       |  FROM m LEFT JOIN done d USING (media_id)),
       |okc AS (
       |  SELECT *, (fmt_pos > 0 AND afmt = 1 AND bits = 16 AND channels > 0
       |             AND rate > 0 AND data_pos > 0 AND data_len >= 0
       |             AND data_pos + data_len - 1 <= n) AS wok
       |  FROM flds),
       |sam AS (
       |  SELECT media_id, wok, channels,
       |    CASE WHEN wok THEN data_len // 2 ELSE 0 END AS ns,
       |    CASE WHEN wok AND channels = 1 AND data_len >= 2
       |         THEN list_transform(range(data_len // 2), i -> $sample)
       |         ELSE [] END AS ss
       |  FROM okc),
       |res AS (
       |  SELECT media_id, (wok AND channels = 1 AND ns > 0) AS ok, ns,
       |    CASE WHEN wok AND channels = 1 AND ns > 0 THEN
       |      list_transform(range(((ns - 1) * 2) // 3 + 1),
       |        i -> CASE WHEN (i * 3) % 2 = 0 THEN 2 * ss[(i * 3) // 2 + 1]
       |                  ELSE ss[(i * 3) // 2 + 1] + ss[(i * 3) // 2 + 2] END)
       |    ELSE [] END AS rs
       |  FROM sam)
       |SELECT media_id, ok, CAST(ns AS BIGINT) AS n_in,
       |  CAST(len(rs) AS BIGINT) AS n_out,
       |  CAST(COALESCE(list_sum(rs), 0) AS BIGINT) AS sum2x,
       |  CAST(COALESCE(list_max(list_transform(rs, x -> abs(x))), 0) AS BIGINT) AS peak2x,
       |  CAST(COALESCE(rs[1], 0) AS BIGINT) AS first2x,
       |  CAST(COALESCE(rs[len(rs) // 2 + 1], 0) AS BIGINT) AS mid2x,
       |  CAST(COALESCE(rs[len(rs)], 0) AS BIGINT) AS last2x
       |FROM res ORDER BY media_id""".stripMargin
  }

  /** m11: rational-rate linear resampling (up=2/down=3 — out rate =
    * ⅔ of source), the canonical ASR-pipeline preprocessing step
    * (everything → 16 kHz). Output sample i sits at source position
    * i·3/2 = k + r/2; the value is kept SCALED BY 2 ((2−r)·s[k] +
    * r·s[k+1]) so the whole operator is exact integer arithmetic —
    * cross-engine hashable, no float resampler drift. Mono only
    * (stereo would deinterleave per channel first — audit path);
    * map-side kernel, one row per clip, no shuffle before the sort. */
  def wavResample(wavs: DataFrame): DataFrame = {
    val spark = wavs.sparkSession
    import spark.implicits._
    wavs.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          def u16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
          def u32(p: Int): Long = (u16(p).toLong | (u16(p + 2).toLong << 16)) & 0xFFFFFFFFL
          def tag(p: Int): String = new String(b, p, 4, "US-ASCII")
          var fmtPos, dataPos = -1L
          var dataLen = -1L
          val riff = b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE"
          if (riff) {
            var pos = 12L
            while (pos + 8 <= b.length) {
              val t = tag(pos.toInt)
              val len = u32(pos.toInt + 4)
              if (t == "fmt ") fmtPos = pos + 8
              if (t == "data") { dataPos = pos + 8; dataLen = len }
              pos += 8 + len + (len % 2)
            }
          }
          val fmtOk = fmtPos > 0 && fmtPos + 16 <= b.length
          val (afmt, channels, rate, bits) =
            if (fmtOk) (u16(fmtPos.toInt), u16(fmtPos.toInt + 2),
              u32(fmtPos.toInt + 4), u16(fmtPos.toInt + 14))
            else (0, 0, 0L, 0)
          val wok = fmtOk && afmt == 1 && bits == 16 && channels > 0 &&
            rate > 0 && dataPos > 0 && dataLen >= 0 &&
            dataPos + dataLen <= b.length
          val ns = if (wok) (dataLen / 2).toInt else 0
          if (!wok || channels != 1 || ns == 0)
            (id, false, ns.toLong, 0L, 0L, 0L, 0L, 0L, 0L)
          else {
            def s(k: Int): Long = u16(dataPos.toInt + 2 * k).toShort.toLong
            val nOut = ((ns - 1) * 2) / 3 + 1
            var sum = 0L
            var peak = 0L
            var first, mid, last = 0L
            var i = 0
            while (i < nOut) {
              val num = i * 3
              val k = num / 2
              val v = if (num % 2 == 0) 2 * s(k) else s(k) + s(k + 1)
              sum += v
              val a = math.abs(v)
              if (a > peak) peak = a
              if (i == 0) first = v
              if (i == nOut / 2) mid = v
              if (i == nOut - 1) last = v
              i += 1
            }
            (id, true, ns.toLong, nOut.toLong, sum, peak, first, mid, last)
          }
        }
      }.toDF("media_id", "ok", "n_in", "n_out", "sum2x", "peak2x",
        "first2x", "mid2x", "last2x")
  }

  /** m8's cross-engine oracle: the sampled frames' pixel statistics
    * re-derived from FIRST PRINCIPLES — the raster rule (pixel j of
    * frame f = text byte (f·64+j) mod n) applied to the documents
    * table directly, never touching the AVI bytes. The engine side
    * reads ONLY the container (RIFF walk → '00dc' chunks → PNG
    * decode), so a hash match certifies the whole walk+codec path:
    * PNG losslessness is the bridge between the two derivations. */
  private val PngAviOracleSql: String =
    s"""WITH vids AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         CAST(octet_length(encode(text)) AS BIGINT) AS n,
       |         5 + ((doc_id // 3) % 12) * 2 AS nf
       |  FROM documents WHERE doc_id % 3 = 2),
       |frames AS (
       |  SELECT doc_id, hx, n, f.f AS fi
       |  FROM vids, UNNEST(generate_series(0, nf - 1)) AS f(f)
       |  WHERE (f.f % 3) = 0),
       |pxv AS (
       |  SELECT doc_id, fi,
       |    CASE WHEN n = 0 THEN 0 ELSE
       |      CAST('0x' || substr(hx, CAST(((fi*64 + j.j) % n)*2 + 1 AS INT), 2) AS INTEGER)
       |    END AS v
       |  FROM frames, UNNEST(generate_series(0, 63)) AS j(j))
       |SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
       |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       |  CAST(SUM(v) AS BIGINT) AS px_sum, CAST(SUM(v*v) AS BIGINT) AS px_sq_sum,
       |  CAST(MIN(v) AS INT) AS px_min, CAST(MAX(v) AS INT) AS px_max
       |FROM pxv GROUP BY doc_id, fi ORDER BY media_id, frame_idx""".stripMargin

  /** m9's oracle: DuckDB re-walks the AVI snapshot bytes — recursive
    * chunk walk with the LIST-descend rule (a LIST header is entered,
    * 12 bytes, identical to [[aviMeta]]), little-endian avih field
    * extraction, '00dc'/'01wb' frame census — so the container audit
    * (including the planted interrupted writes) is cross-engine
    * certified byte-for-byte. */
  private val AviOracleSql: String = {
    def pair(q: String) = s"substr(hx, CAST((($q)-1)*2+1 AS INT), 2)"
    def u32le(p: String) =
      s"CAST('0x' || ${pair(s"($p)+3")} || ${pair(s"($p)+2")} || " +
        s"${pair(s"($p)+1")} || ${pair(p)} AS BIGINT)"
    s"""WITH RECURSIVE m AS (
       |  SELECT media_id, hex(payload) AS hx,
       |         CAST(octet_length(payload) AS BIGINT) AS n
       |  FROM read_parquet('$AviSnapshot/*.parquet')),
       |walk AS (
       |  SELECT media_id, hx, n, CAST(13 AS BIGINT) AS pos,
       |         CAST(0 AS BIGINT) AS avih_pos,
       |         CAST(0 AS BIGINT) AS ff, CAST(0 AS BIGINT) AS fb
       |  FROM m WHERE n >= 12 AND substr(hx, 1, 8) = '52494646'
       |    AND substr(hx, 17, 8) = '41564920'
       |  UNION ALL
       |  SELECT media_id, hx, n,
       |         CASE WHEN typ = '4C495354' THEN pos + 12
       |              ELSE pos + 8 + len + (len % 2) END,
       |         CASE WHEN typ = '61766968' THEN pos + 8 ELSE avih_pos END,
       |         ff + CASE WHEN typ IN ('30306463','30317762') THEN 1 ELSE 0 END,
       |         fb + CASE WHEN typ IN ('30306463','30317762') THEN len ELSE 0 END
       |  FROM (SELECT media_id, hx, n, pos, avih_pos, ff, fb,
       |          substr(hx, CAST((pos-1)*2+1 AS INT), 8) AS typ,
       |          ${u32le("pos + 4")} AS len
       |        FROM walk WHERE pos + 8 <= n + 1)),
       |done AS (
       |  SELECT media_id, MAX_BY(avih_pos, pos) AS avih_pos,
       |         MAX_BY(ff, pos) AS ff, MAX_BY(fb, pos) AS fb
       |  FROM walk GROUP BY media_id),
       |flds AS (
       |  SELECT m.media_id, m.hx, m.n,
       |    COALESCE(d.avih_pos, 0) AS ap,
       |    COALESCE(d.ff, 0) AS ff, COALESCE(d.fb, 0) AS fb,
       |    (COALESCE(d.avih_pos, 0) > 0 AND d.avih_pos + 56 <= m.n + 1) AS avih_ok
       |  FROM m LEFT JOIN done d USING (media_id)),
       |vals AS (
       |  SELECT media_id, ff, fb, avih_ok,
       |    CASE WHEN avih_ok THEN ${u32le("ap")} ELSE 0 END AS usf,
       |    CASE WHEN avih_ok THEN ${u32le("ap + 24")} ELSE 0 END AS streams,
       |    CASE WHEN avih_ok THEN ${u32le("ap + 16")} ELSE -1 END AS declared,
       |    CASE WHEN avih_ok THEN ${u32le("ap + 32")} ELSE 0 END AS w,
       |    CASE WHEN avih_ok THEN ${u32le("ap + 36")} ELSE 0 END AS h
       |  FROM flds)
       |SELECT media_id, (avih_ok AND usf > 0 AND ff = declared) AS ok,
       |  usf AS us_per_frame, streams AS n_streams, w AS width, h AS height,
       |  declared AS declared_frames, ff AS frames_found, fb AS frame_bytes,
       |  CASE WHEN avih_ok AND usf > 0 AND ff = declared
       |       THEN declared * usf // 1000 ELSE 0 END AS duration_ms
       |FROM vals ORDER BY media_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // m1: REAL decoded-pixel histogram for images, stub byte histogram
    // for audio/video. PNG losslessness makes the image branch
    // oracle-checkable from SOURCE bytes: the decoded raster is the
    // first 256 text bytes zero-padded, so its intensity histogram is
    // the high-nibble count over those bytes (+ padding into bin 0).
    // The stub branch keeps the low-nibble byte histogram the r3–r6
    // oracle checked.
    QueryDef("m1_media_features",
      """WITH h AS (
        |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS kind,
        |         hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents),
        |imgf AS (
        |  SELECT doc_id, kind, 256 AS nb,
        |         [CAST(((CASE WHEN x = 0 THEN 256 - LEAST(n, 256) ELSE 0 END)
        |            + length(hi) - length(replace(hi, substr('0123456789ABCDEF', x+1, 1), ''))
        |           ) / 256.0 AS FLOAT) for x in range(16)] AS f
        |  FROM (SELECT doc_id, kind, n,
        |          substr(regexp_replace(hx, '(.)(.)', '\1', 'g'), 1,
        |                 CAST(LEAST(n, 256) AS INT)) AS hi
        |        FROM h WHERE kind = 0)),
        |stubf AS (
        |  SELECT doc_id, kind, n AS nb,
        |         [CAST((length(nib) - length(replace(nib, substr('0123456789ABCDEF', x+1, 1), ''))) * 1.0 / n AS FLOAT) for x in range(16)] AS f
        |  FROM (SELECT doc_id, kind, n,
        |          regexp_replace(hx, '(.)(.)', '\2', 'g') AS nib
        |        FROM h WHERE kind <> 0))
        |SELECT doc_id AS media_id, kind, CAST(nb AS INT) AS n_bytes,
        |       ROUND(list_sum([CAST(y AS DOUBLE) for y in f]), 3) AS feat_sum,
        |       ROUND(CAST(f[1] AS DOUBLE), 5) AS f0
        |FROM (SELECT * FROM imgf UNION ALL SELECT * FROM stubf)
        |ORDER BY media_id""".stripMargin) { (s, d) =>
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
      frameSample(mediaTable(s, d, imagePayloads = false))
        .orderedRows(col("media_id"), col("frame_idx")) // frames scale with corpus
    },

    // m3: REAL resize — decode the PNG payload, resample the decoded
    // 16×16 raster to 12×12. Driver-facing projection keeps scalars
    // only (binary columns, like arrays, break order-canonicalizing
    // result harnesses): the resized raster is verified through its
    // length and pixel sum, reproduced exactly by the oracle's
    // nearest-neighbor index arithmetic over the SOURCE bytes
    // (losslessness again — decoded pixel s = source byte s, or 0
    // beyond the text).
    QueryDef("m3_resize",
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT media_id, CAST(12 AS INT) AS out_w, CAST(12 AS INT) AS out_h,
        |       CAST(144 AS INT) AS out_len,
        |  CAST(list_sum([
        |    CASE WHEN ((i//12)*16//12)*16 + ((i%12)*16//12) < n THEN
        |      (strpos('0123456789ABCDEF', substr(hx, (((i//12)*16//12)*16 + ((i%12)*16//12))*2+1, 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substr(hx, (((i//12)*16//12)*16 + ((i%12)*16//12))*2+2, 1)) - 1)
        |    ELSE 0 END for i in range(144)]) AS BIGINT) AS byte_sum
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
    },

    // m5: perceptual-hash image near-dup (see phashPairs). The oracle
    // brute-forces every pair from SOURCE bytes: PNG gray8 is
    // lossless, so the decoded raster is the first 256 text bytes
    // zero-padded and DuckDB recomputes pixel values from hex(text),
    // the 9×8 resample indices, the gradient bits, and the exact
    // Hamming distance — certifying decode, resample, hash, and
    // pairing in one hash match. The engine's chunk-pigeonhole
    // candidate join is exact at maxDist ≤ 3, so sub-quadratic
    // candidates equal the brute force. Bits assemble via INTEGER
    // shifts (bits 0–62 summed, bit 63 added as the sign value):
    // DuckDB's `**` returns DOUBLE even on HUGEINT, and a 64-bit
    // hash routed through doubles silently loses its low bits.
    QueryDef("m5_phash_neardup",
      """WITH h AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT doc_id,
        |    [CASE WHEN i < LEAST(n, 256)
        |          THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1))-1)
        |             + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1))-1)
        |          ELSE 0 END for i in range(256)] AS p
        |  FROM h),
        |g AS (
        |  SELECT doc_id,
        |    [p[(i//9*2)*16 + ((i%9)*16)//9 + 1] for i in range(72)] AS r
        |  FROM px),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN r[(i//8)*9 + (i%8) + 1] > r[(i//8)*9 + (i%8) + 2]
        |              THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END
        |              for i in range(63)]) AS BIGINT)
        |    + CASE WHEN r[71] > r[72] THEN CAST(-9223372036854775808 AS BIGINT)
        |           ELSE CAST(0 AS BIGINT) END AS hash
        |  FROM g)
        |SELECT ia, ib, CAST(d AS INT) AS hamming FROM (
        |  SELECT a.doc_id ia, b.doc_id ib, bit_count(xor(a.hash, b.hash)) AS d
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |WHERE d <= 3 ORDER BY ia, ib""".stripMargin) { (s, d) =>
      phashPairs(mediaTable(s, d))
        .orderedRows(col("ia"), col("ib")) // near-dup pairs scale with corpus
    },

    // m6: CONTAINER metadata + structural audit — the ingest-side
    // triage pass a media corpus runs BEFORE any decode: sniff the
    // container by magic bytes, read the header fields (PNG IHDR
    // dims/depth/color), walk the chunk framing end-to-end, and flag
    // rows whose structure doesn't close (truncated upload, wrong
    // extension, bit rot) — all without paying a pixel decode. One
    // row-wise kernel, no shuffle; the engine's walk ADDITIONALLY
    // verifies each chunk's CRC32 (spec-planted corruption proves the
    // stricter check, equal on well-formed data). The oracle re-walks
    // the same payload bytes from the engine-written snapshot in pure
    // SQL — a recursive CTE over the hex image with big-endian field
    // extraction — so the hash certifies the container parse itself,
    // cross-engine. ORACLE PRECONDITION: the SQL walk has no CRC
    // check and labels any magic-prefixed payload png, so it matches
    // the stricter engine only on well-formed corpora — true here by
    // construction (PNGs are engine-encoded) and PINNED by the m6
    // spec's corpus audit; on hostile data the engine is the
    // authority and the spec's planted corruptions prove it rejects.
    QueryDef("m6_container_meta",
      s"""WITH RECURSIVE m AS (
         |  SELECT media_id, kind, hex(payload) AS hx,
         |         CAST(octet_length(payload) AS BIGINT) AS n
         |  FROM read_parquet('$MediaSnapshot/*.parquet')),
         |walk AS (
         |  SELECT media_id, hx, n, CAST(9 AS BIGINT) AS pos,
         |         CAST(0 AS BIGINT) AS n_chunks, CAST(0 AS BIGINT) AS idat,
         |         '' AS last_t
         |  FROM m WHERE substr(hx, 1, 16) = '89504E470D0A1A0A'
         |  UNION ALL
         |  SELECT media_id, hx, n, pos + 12 + len, n_chunks + 1,
         |         idat + CASE WHEN typ = '49444154' THEN len ELSE 0 END, typ
         |  FROM (SELECT media_id, hx, n, pos, n_chunks, idat,
         |          CAST(CAST('0x' || substr(hx, CAST((pos-1)*2+1 AS INT), 8) AS INTEGER) AS BIGINT) AS len,
         |          substr(hx, CAST((pos+3)*2+1 AS INT), 8) AS typ
         |        FROM walk WHERE pos + 8 <= n + 1)),
         |done AS (
         |  SELECT media_id, MAX(pos) AS fin,
         |         MAX_BY(n_chunks, pos) AS n_chunks, MAX_BY(idat, pos) AS idat,
         |         MAX_BY(last_t, pos) AS last_t, MAX(n) AS n
         |  FROM walk GROUP BY media_id),
         |png AS (
         |  SELECT m.media_id, m.kind, 'png' AS container,
         |    CAST(CAST('0x' || substr(hx, 33, 8) AS INTEGER) AS BIGINT) AS width,
         |    CAST(CAST('0x' || substr(hx, 41, 8) AS INTEGER) AS BIGINT) AS height,
         |    CAST(CAST('0x' || substr(hx, 49, 2) AS INTEGER) AS BIGINT) AS bit_depth,
         |    CAST(CAST('0x' || substr(hx, 51, 2) AS INTEGER) AS BIGINT) AS color_type,
         |    d.n_chunks, d.idat AS idat_bytes,
         |    (d.fin = d.n + 1 AND d.last_t = '49454E44') AS ok
         |  FROM m JOIN done d USING (media_id)),
         |raw AS (
         |  SELECT media_id, kind, 'raw' AS container,
         |    CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
         |    CAST(NULL AS BIGINT) AS bit_depth, CAST(NULL AS BIGINT) AS color_type,
         |    CAST(0 AS BIGINT) AS n_chunks, CAST(0 AS BIGINT) AS idat_bytes,
         |    TRUE AS ok
         |  FROM m WHERE substr(hx, 1, 16) <> '89504E470D0A1A0A')
         |SELECT * FROM (SELECT * FROM png UNION ALL SELECT * FROM raw)
         |ORDER BY media_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = mediaTable(s, d)
      writeMediaSnapshotIfStale(s, d, media)
      containerMeta(media).orderedRows(col("media_id")) // one row per item
    },

    // m7: REAL audio — RIFF/WAVE container walk + PCM16 sample decode
    // (r10; closes the "audio is a byte-histogram stub" gap at the
    // container/sample level: WAV needs no codec, compressed audio
    // would). The corpus varies rates, channel counts, lengths,
    // odd-sized LIST chunks (RIFF pad rule), and plants truncated
    // uploads; the oracle RE-PARSES the same payload bytes in DuckDB —
    // recursive-CTE chunk walk with little-endian field extraction,
    // signed-int16 sample lists via list_transform, integer-exact
    // peak/sum-of-squares — so container framing, fmt fields, padding,
    // bounds checks, and the PCM decode are all cross-engine
    // certified. Scale shape: pure map-side kernel, no shuffle before
    // the output sort.
    QueryDef("m7_wav_features", WavOracleSql) { (s, d) =>
      val wavs = wavTable(s, d)
      writeWavSnapshotIfStale(s, d, wavs)
      wavFeatures(wavs).orderedRows(col("media_id")) // one row per clip
    },

    // m8: REAL video frames (r11, VERDICT r10 task 2) — the corpus's
    // AVIs carry PNG-coded movi chunks (intra-only/MJPEG-style, PNG as
    // the per-frame codec), the engine walks the container, samples
    // every 3rd frame, and DECODES it with the m4 image codec; the
    // oracle re-derives the pixel stats from the raster rule over raw
    // text (PngAviOracleSql — PNG losslessness makes the derivations
    // equal). Scale shape: pure map-side walk+decode kernel, rows
    // scale with frames, no shuffle before the output sort.
    QueryDef("m8_video_frames", PngAviOracleSql) { (s, d) =>
      aviFrameFeatures(pngAviTable(s, d), k = 3)
        .orderedRows(col("media_id"), col("frame_idx"))
    },

    // m9: AVI container audit (wires the r10 AVI walk end-to-end —
    // ADVICE r10): RIFF('AVI ') framing, avih main-header fields,
    // '00dc'/'01wb' frame census vs the declared count — the
    // interrupted-upload audit ingest runs before paying any decode.
    // The oracle RE-WALKS the same payload bytes in DuckDB
    // (AviOracleSql). Map-side kernel; one row per container.
    QueryDef("m9_avi_audit", AviOracleSql) { (s, d) =>
      val avis = aviTable(s, d)
      writeAviSnapshotIfStale(s, d, avis)
      aviMeta(avis).orderedRows(col("media_id"))
    },

    // m10: MJPEG frame decode (r12, VERDICT r11 item 6) — m8's sibling
    // in the dominant REAL intra-only coding: movi chunks are complete
    // JPEGs, decoded with the JVM's own codec. Lossy ⇒ golden-pinned
    // (deterministic per codec; parallelism-verified like k1's pin)
    // instead of SQL-oracled; the planted truncated frames exercise
    // the ok=false decode-error audit path end-to-end. Map-side
    // walk+decode kernel, rows scale with frames, no shuffle before
    // the output sort.
    QueryDef.noOracle("m10_mjpeg_frames") { (s, d) =>
      mjpegFrameFeatures(mjpegAviTable(s, d), k = 3)
        .orderedRows(col("media_id"), col("frame_idx"))
    },

    // m11: audio RESAMPLING (r12) — rational 2/3-rate linear
    // interpolation, the ASR-pipeline normalization step (everything
    // to one rate before featurization). Values stay SCALED BY 2 so
    // the operator is exact integer arithmetic end-to-end and the
    // oracle re-derives container walk + PCM16 decode + the identical
    // interpolation in SQL — a resampler certified without a float.
    // Mono only (stereo rows take the ok=false audit path, like the
    // planted corrupt clips). Map-side kernel, one row per clip.
    QueryDef("m11_wav_resample", WavResampleOracleSql) { (s, d) =>
      val wavs = wavTable(s, d)
      writeWavSnapshotIfStale(s, d, wavs)
      wavResample(wavs).orderedRows(col("media_id"))
    },

    // m12: MP3 FRAME-HEADER AUDIT (r14, VERDICT r13 item 7) — the
    // first REAL audit through the MediaDecoders SPI (Mp3FrameAuditor;
    // mounted per-executor-JVM inside the task, the ServiceLoader
    // deployment model): sync-word walk, per-frame bitrate/rate/
    // padding, frame census, duration — no PCM, none needed for the
    // ingest health check. The fixture plants truncated uploads,
    // trailing junk, and mid-stream corruption; the oracle re-walks
    // the same bytes in DuckDB (ID3v2 syncsafe skip + the Layer III
    // frame-length formula). h264 (kind 2) stub behavior unchanged —
    // the auditor's decodeRaster is None for every payload.
    QueryDef("m12_mp3_audit", Mp3OracleSql) { (s, d) =>
      val mp3s = mp3Table(s, d)
      writeMp3SnapshotIfStale(s, d, mp3s)
      mp3Audit(mp3s).orderedRows(col("media_id"))
    },

    // m13: H.264 ANNEX-B NAL AUDIT (r14) — m12's video twin, making
    // the no-decode audit story uniform across the lossy kinds:
    // start-code walk, forbidden_zero_bit validation, SPS/PPS/IDR/
    // slice census, structural-completeness ok rule. Same SPI mount
    // (H264NalAuditor, per-executor-JVM inside the task); kind-2
    // raster stubs unchanged (decodeRaster None). Fixture plants a
    // forbidden-bit violation, leading garbage, and a missing SPS;
    // the oracle re-walks the bytes in DuckDB with the identical
    // scan-and-skip rule.
    QueryDef("m13_h264_audit", H264OracleSql) { (s, d) =>
      val h264s = h264Table(s, d)
      writeH264SnapshotIfStale(s, d, h264s)
      h264Audit(h264s).orderedRows(col("media_id"))
    }
  )

  /** m12's (media_id, payload) MP3 snapshot for the DuckDB re-walk.
    * Lazy (declared below `defs`): the entry list captures these at
    * object init. */
  private lazy val Mp3Snapshot =
    System.getProperty("java.io.tmpdir") + "/graft_mp3_snapshot"

  /** Deterministic MPEG-1 Layer III byte stream for one media id:
    * valid 4-byte frame headers with per-frame bitrate and padding
    * variation (frame body bytes are deterministic filler — the
    * header walk never reads them), an ID3v2 prefix on a minority,
    * and three planted audit cases: a truncated final frame
    * (id%5==0), trailing junk (id%7==2), and a mid-stream invalid
    * header (id%11==3). */
  private[queries] def encodeMp3(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val kbpsTab = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
      192, 224, 256, 320)
    val rates = Array(44100, 48000, 32000)
    if (id % 4 == 1) {
      val tagSize = 17 + (id % 23).toInt
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4.0, no flags
      out.write((tagSize >> 21) & 0x7F); out.write((tagSize >> 14) & 0x7F)
      out.write((tagSize >> 7) & 0x7F); out.write(tagSize & 0x7F)
      var j = 0
      while (j < tagSize) { out.write(((id * 29 + j * 3) % 251).toInt); j += 1 }
    }
    val ridx = ((id / 3) % 3).toInt
    val rate = rates(ridx)
    val nFrames = 4 + (id % 6).toInt
    val truncate = id % 5 == 0
    var i = 0
    while (i < nFrames) {
      val bidx = 1 + ((id + i * 3) % 14).toInt
      val pad = ((id + i) % 2).toInt
      val kbps = kbpsTab(bidx - 1)
      val flen = (144000L * kbps / rate).toInt + pad
      val frame = new Array[Byte](flen)
      frame(0) = 0xFF.toByte
      frame(1) = 0xFB.toByte // sync + MPEG1 + Layer III + no CRC
      frame(2) = ((bidx << 4) | (ridx << 2) | (pad << 1)).toByte
      frame(3) = ((id * 7 + i * 11) % 256).toByte
      var j = 4
      while (j < flen) {
        frame(j) = ((id * 31 + i * 17 + j * 13) % 251).toByte; j += 1
      }
      if (truncate && i == nFrames - 1) out.write(frame, 0, flen - 9)
      else out.write(frame)
      i += 1
    }
    if (!truncate) {
      if (id % 7 == 2) { out.write(0); out.write(0) } // trailing junk
      else if (id % 11 == 3) { // mid-ingest corruption: bidx=0 header
        out.write(0xFF); out.write(0xFB); out.write(0x0C); out.write(0)
        out.write(1); out.write(2)
      }
    }
    out.toByteArray
  }

  /** Deterministic MP3 corpus from the documents table (the media
    * table's audio kind) — header-real, body-filler: exactly what the
    * no-PCM audit consumes. */
  def mp3Table(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 1) // the media table's audio kind
      .select(col("doc_id"))
      .fanOut
      .as[Long]
      .mapPartitions(it => it.map(id => (id, encodeMp3(id))))(graft.Enc.longBytes)
      .toDF("media_id", "payload")
  }

  /** m12 kernel: the frame-header audit, routed through the
    * MediaDecoders SPI — `ensureRegistered` runs INSIDE the task, the
    * per-executor-JVM mount a ServiceLoader deployment performs from
    * its classpath. Map-side, one row per clip, no shuffle before the
    * output sort. */
  def mp3Audit(mp3s: DataFrame): DataFrame = {
    val spark = mp3s.sparkSession
    import spark.implicits._
    mp3s.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])](graft.Enc.longBytes)
      .mapPartitions { it =>
        graft.functions.MediaDecoders.ensureRegistered(
          graft.functions.Mp3FrameAuditor)
        it.map { case (id, payload) =>
          val f = graft.functions.MediaDecoders.auditOf(1, payload)
            .getOrElse(Seq.empty).toMap
          (id, f.getOrElse("ok", 0L) == 1L,
            f.getOrElse("n_frames", 0L), f.getOrElse("frame_bytes", 0L),
            f.getOrElse("sample_rate", 0L), f.getOrElse("kbps_sum", 0L),
            f.getOrElse("duration_ms", 0L))
        }
      }(graft.Enc.longBoolLong5)
      .toDF("media_id", "ok", "n_frames", "frame_bytes",
        "sample_rate", "kbps_sum", "duration_ms")
  }

  /** m12's oracle: DuckDB re-walks the MP3 snapshot bytes — ID3v2
    * syncsafe skip, per-frame header validation, the Layer III frame
    * length formula, and the strict consumed-exactly ok rule — so the
    * audit (including all three planted failure cases) is
    * cross-engine certified byte-for-byte. */
  private lazy val Mp3OracleSql: String = {
    def u8(p: String) =
      s"CAST('0x' || substr(hx, CAST((($p)-1)*2+1 AS INT), 2) AS BIGINT)"
    s"""WITH RECURSIVE m AS (
       |  SELECT media_id, hex(payload) AS hx,
       |         CAST(octet_length(payload) AS BIGINT) AS n
       |  FROM read_parquet('$Mp3Snapshot/*.parquet')),
       |start AS (
       |  SELECT media_id, hx, n,
       |    CASE WHEN n >= 10 AND substr(hx, 1, 6) = '494433'
       |         THEN 11 + (${u8("7")} % 128) * 2097152
       |                 + (${u8("8")} % 128) * 16384
       |                 + (${u8("9")} % 128) * 128 + (${u8("10")} % 128)
       |         ELSE 1 END AS pos
       |  FROM m),
       |walk AS (
       |  SELECT media_id, hx, n, pos,
       |         CAST(0 AS BIGINT) AS frames, CAST(0 AS BIGINT) AS fbytes,
       |         CAST(0 AS BIGINT) AS kbps_sum, CAST(0 AS BIGINT) AS rate1,
       |         FALSE AS bad, CAST(0 AS BIGINT) AS step
       |  FROM start
       |  UNION ALL
       |  SELECT media_id, hx, n,
       |         CASE WHEN fits THEN pos + flen ELSE pos END,
       |         frames + CASE WHEN fits THEN 1 ELSE 0 END,
       |         fbytes + CASE WHEN fits THEN flen ELSE 0 END,
       |         kbps_sum + CASE WHEN fits THEN kbps ELSE 0 END,
       |         CASE WHEN fits AND frames = 0 THEN rate ELSE rate1 END,
       |         NOT fits, step + 1
       |  FROM (
       |    SELECT *, (valid AND pos + flen - 1 <= n) AS fits FROM (
       |      SELECT *, CASE WHEN rate > 0
       |             THEN (144000 * kbps) // rate + pad ELSE 0 END AS flen
       |      FROM (
       |        SELECT *,
       |          CASE bidx WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
       |            WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96
       |            WHEN 8 THEN 112 WHEN 9 THEN 128 WHEN 10 THEN 160
       |            WHEN 11 THEN 192 WHEN 12 THEN 224 WHEN 13 THEN 256
       |            WHEN 14 THEN 320 ELSE 0 END AS kbps,
       |          CASE ridx WHEN 0 THEN 44100 WHEN 1 THEN 48000
       |            WHEN 2 THEN 32000 ELSE 0 END AS rate,
       |          (h0 = 255 AND h1 >= 224 AND ((h1 // 8) % 4) = 3
       |            AND ((h1 // 2) % 4) = 1
       |            AND bidx BETWEEN 1 AND 14 AND ridx <= 2) AS valid
       |        FROM (
       |          SELECT *, (h2 // 16) % 16 AS bidx, (h2 // 4) % 4 AS ridx,
       |                 (h2 // 2) % 2 AS pad
       |          FROM (
       |            SELECT media_id, hx, n, pos, frames, fbytes, kbps_sum,
       |                   rate1, bad, step,
       |                   ${u8("pos")} AS h0, ${u8("pos + 1")} AS h1,
       |                   ${u8("pos + 2")} AS h2
       |            FROM walk WHERE NOT bad AND pos + 3 <= n))))) t),
       |done AS (
       |  SELECT media_id, MAX_BY(pos, step) AS pos,
       |         MAX_BY(frames, step) AS frames, MAX_BY(fbytes, step) AS fbytes,
       |         MAX_BY(kbps_sum, step) AS kbps_sum,
       |         MAX_BY(rate1, step) AS rate1, MAX_BY(bad, step) AS bad,
       |         MAX(n) AS n
       |  FROM walk GROUP BY media_id)
       |SELECT media_id,
       |  (frames >= 1 AND NOT bad AND pos = n + 1) AS ok,
       |  frames AS n_frames, fbytes AS frame_bytes, rate1 AS sample_rate,
       |  kbps_sum,
       |  CASE WHEN rate1 > 0 THEN (frames * 1152 * 1000) // rate1
       |       ELSE 0 END AS duration_ms
       |FROM done ORDER BY media_id""".stripMargin
  }

  /** m13's (media_id, payload) H.264 snapshot for the DuckDB re-walk. */
  private lazy val H264Snapshot =
    System.getProperty("java.io.tmpdir") + "/graft_h264_snapshot"

  /** Deterministic H.264 Annex-B byte stream for one media id: real
    * start codes (3- and 4-byte forms mixed) and NAL headers, filler
    * bodies restricted to 0x10..0xF9 — NO zero bytes, so the 00 00 01
    * pattern can only occur at true start codes (real H.264 guarantees
    * the same via emulation-prevention bytes; the fixture achieves it
    * by construction so the oracle's pattern search is exact). Plants:
    * a forbidden_zero_bit violation (id%5==0), leading garbage before
    * the first start code (id%7==2), and a missing SPS (id%11==3). */
  private[queries] def encodeH264(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var k = 0
    def nal(hdr: Int, bodyLen: Int): Unit = {
      if (k == 0 || (id + k) % 2 == 0) out.write(0) // 4-byte form
      out.write(0); out.write(0); out.write(1)
      out.write(hdr)
      var j = 0
      while (j < bodyLen) {
        out.write((((id * 37 + k * 11 + j * 7) % 234) + 16).toInt); j += 1
      }
      k += 1
    }
    if (id % 7 == 2) { out.write(0x19); out.write(0x2A) } // leading junk
    if (id % 11 != 3) nal(0x67, 8 + (id % 5).toInt) // SPS
    nal(0x68, 4 + (id % 3).toInt) // PPS
    if (id % 3 == 0) nal(0x06, 6) // SEI
    nal(0x65, 40 + (id % 23).toInt) // IDR slice
    val nSlices = 2 + (id % 4).toInt
    var i = 0
    while (i < nSlices) {
      // one planted forbidden_zero_bit violation on the middle slice
      val hdr = if (id % 5 == 0 && i == 1) 0xC1 else 0x41
      nal(hdr, 30 + ((id + i) % 17).toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Deterministic H.264 corpus from the documents table (the media
    * table's video kind) — start-code/header-real, body-filler: what
    * the no-decode audit consumes. */
  def h264Table(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 2) // the media table's video kind
      .select(col("doc_id"))
      .fanOut
      .as[Long]
      .mapPartitions(it => it.map(id => (id, encodeH264(id))))(graft.Enc.longBytes)
      .toDF("media_id", "payload")
  }

  /** m13 kernel: the NAL audit through the MediaDecoders SPI (mounted
    * per-executor-JVM inside the task, like m12). Map-side, one row
    * per clip. */
  def h264Audit(h264s: DataFrame): DataFrame = {
    val spark = h264s.sparkSession
    import spark.implicits._
    h264s.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])](graft.Enc.longBytes)
      .mapPartitions { it =>
        graft.functions.MediaDecoders.ensureRegistered(
          graft.functions.H264NalAuditor)
        it.map { case (id, payload) =>
          val f = graft.functions.MediaDecoders.auditOf(2, payload)
            .getOrElse(Seq.empty).toMap
          (id, f.getOrElse("ok", 0L) == 1L,
            f.getOrElse("n_nals", 0L), f.getOrElse("n_sps", 0L),
            f.getOrElse("n_pps", 0L), f.getOrElse("n_idr", 0L),
            f.getOrElse("n_slice", 0L), f.getOrElse("n_other", 0L))
        }
      }(graft.Enc.longBoolLong6)
      .toDF("media_id", "ok", "n_nals", "n_sps", "n_pps", "n_idr",
        "n_slice", "n_other")
  }

  /** m13's oracle: DuckDB re-walks the Annex-B snapshot bytes — the
    * same 3-byte start-code scan with 3-byte skip (strpos over hex;
    * exact because fixture bodies carry no zero bytes), per-NAL
    * header validation, type census, and the SPS/PPS/IDR completeness
    * rule. Each recursion step classifies the PREVIOUS unit (whose
    * extent is now known); the final unit folds in at the end. */
  private lazy val H264OracleSql: String = {
    def u8(p: String) =
      s"CAST('0x' || substr(hx, CAST((($p)-1)*2+1 AS INT), 2) AS BIGINT)"
    s"""WITH RECURSIVE m AS (
       |  SELECT media_id, hex(payload) AS hx,
       |         CAST(octet_length(payload) AS BIGINT) AS n
       |  FROM read_parquet('$H264Snapshot/*.parquet')),
       |walk AS (
       |  SELECT media_id, hx, n, CAST(0 AS BIGINT) AS spos,
       |         CAST(-1 AS BIGINT) AS prev_h, CAST(-1 AS BIGINT) AS first_m,
       |         CAST(0 AS BIGINT) AS n_nals, CAST(0 AS BIGINT) AS n_sps,
       |         CAST(0 AS BIGINT) AS n_pps, CAST(0 AS BIGINT) AS n_idr,
       |         CAST(0 AS BIGINT) AS n_slice, CAST(0 AS BIGINT) AS n_oth,
       |         CAST(0 AS BIGINT) AS n_bad, CAST(0 AS BIGINT) AS step
       |  FROM m
       |  UNION ALL
       |  SELECT media_id, hx, n, mb + 3, mb + 3,
       |         CASE WHEN first_m < 0 THEN mb ELSE first_m END,
       |         n_nals + 1,
       |         n_sps + CASE WHEN pvalid AND ptype = 7 THEN 1 ELSE 0 END,
       |         n_pps + CASE WHEN pvalid AND ptype = 8 THEN 1 ELSE 0 END,
       |         n_idr + CASE WHEN pvalid AND ptype = 5 THEN 1 ELSE 0 END,
       |         n_slice + CASE WHEN pvalid AND ptype = 1 THEN 1 ELSE 0 END,
       |         n_oth + CASE WHEN pvalid
       |                       AND ptype NOT IN (7, 8, 5, 1) THEN 1 ELSE 0 END,
       |         n_bad + CASE WHEN prev_h >= 0 AND NOT pvalid THEN 1 ELSE 0 END,
       |         step + 1
       |  FROM (
       |    SELECT *,
       |      (prev_h >= 0 AND mb - prev_h >= 2 AND phdr < 128) AS pvalid,
       |      phdr % 32 AS ptype
       |    FROM (
       |      SELECT *, spos + (rel - 1) // 2 AS mb,
       |        CASE WHEN prev_h >= 0 AND prev_h + 1 <= n
       |             THEN ${u8("prev_h + 1")} ELSE 128 END AS phdr
       |      FROM (
       |        SELECT *, strpos(substr(hx, CAST(spos * 2 + 1 AS INT)),
       |                         '000001') AS rel
       |        FROM walk) t0
       |      WHERE rel > 0) t1) t2),
       |last AS (
       |  SELECT media_id, MAX_BY(hx, step) AS hx, MAX(n) AS n,
       |         MAX_BY(prev_h, step) AS prev_h,
       |         MAX_BY(first_m, step) AS first_m,
       |         MAX_BY(n_nals, step) AS n_nals, MAX_BY(n_sps, step) AS n_sps,
       |         MAX_BY(n_pps, step) AS n_pps, MAX_BY(n_idr, step) AS n_idr,
       |         MAX_BY(n_slice, step) AS n_slice, MAX_BY(n_oth, step) AS n_oth,
       |         MAX_BY(n_bad, step) AS n_bad
       |  FROM walk GROUP BY media_id),
       |fin AS (
       |  SELECT media_id, n, first_m, n_nals,
       |    n_sps + CASE WHEN fvalid AND ftype = 7 THEN 1 ELSE 0 END AS n_sps,
       |    n_pps + CASE WHEN fvalid AND ftype = 8 THEN 1 ELSE 0 END AS n_pps,
       |    n_idr + CASE WHEN fvalid AND ftype = 5 THEN 1 ELSE 0 END AS n_idr,
       |    n_slice + CASE WHEN fvalid AND ftype = 1 THEN 1 ELSE 0 END AS n_slice,
       |    n_oth + CASE WHEN fvalid AND ftype NOT IN (7, 8, 5, 1)
       |                 THEN 1 ELSE 0 END AS n_oth,
       |    n_bad + CASE WHEN prev_h >= 0 AND NOT fvalid THEN 1 ELSE 0 END AS n_bad,
       |    CASE WHEN first_m >= 0 AND first_m <= 1
       |          AND (first_m = 0 OR ${u8("1")} = 0) THEN TRUE
       |         ELSE FALSE END AS started
       |  FROM (
       |    SELECT *,
       |      (prev_h >= 0 AND n - prev_h >= 2 AND fhdr < 128) AS fvalid,
       |      fhdr % 32 AS ftype
       |    FROM (
       |      SELECT *,
       |        CASE WHEN prev_h >= 0 AND prev_h + 1 <= n
       |             THEN ${u8("prev_h + 1")} ELSE 128 END AS fhdr
       |      FROM last) u0) u1)
       |SELECT media_id,
       |  (started AND n_bad = 0 AND n_sps >= 1 AND n_pps >= 1
       |   AND n_idr >= 1) AS ok,
       |  n_nals, n_sps, n_pps, n_idr, n_slice,
       |  n_oth + n_bad AS n_other
       |FROM fin ORDER BY media_id""".stripMargin
  }

  private def writeH264SnapshotIfStale(s: SparkSession, d: String,
      h264s: DataFrame): Unit = synchronized {
    if (mediaSnapshotSf.get(H264Snapshot) != d) {
      h264s.select(col("media_id"), col("payload"))
        .write.mode("overwrite").parquet(H264Snapshot)
      mediaSnapshotSf.put(H264Snapshot, d)
    }
  }

  private def writeMp3SnapshotIfStale(s: SparkSession, d: String,
      mp3s: DataFrame): Unit = synchronized {
    if (mediaSnapshotSf.get(Mp3Snapshot) != d) {
      mp3s.select(col("media_id"), col("payload"))
        .write.mode("overwrite").parquet(Mp3Snapshot)
      mediaSnapshotSf.put(Mp3Snapshot, d)
    }
  }

  private def writeAviSnapshotIfStale(s: SparkSession, d: String,
      avis: DataFrame): Unit = synchronized {
    if (mediaSnapshotSf.get(AviSnapshot) != d) {
      avis.select(col("media_id"), col("payload"))
        .write.mode("overwrite").parquet(AviSnapshot)
      mediaSnapshotSf.put(AviSnapshot, d)
    }
  }

  private def writeWavSnapshotIfStale(s: SparkSession, d: String,
      wavs: DataFrame): Unit = synchronized {
    if (mediaSnapshotSf.get(WavSnapshot) != d) {
      wavs.select(col("media_id"), col("payload"))
        .write.mode("overwrite").parquet(WavSnapshot)
      mediaSnapshotSf.put(WavSnapshot, d)
    }
  }

  private def writeMediaSnapshotIfStale(s: SparkSession, d: String,
      media: DataFrame): Unit = synchronized {
    if (mediaSnapshotSf.get(MediaSnapshot) != d) {
      media.select(col("media_id"), col("meta.kind").as("kind"), col("payload"))
        .write.mode("overwrite").parquet(MediaSnapshot)
      mediaSnapshotSf.put(MediaSnapshot, d)
    }
  }

  /** Container-structure kernel: magic sniff, PNG IHDR fields, full
    * chunk walk with per-chunk CRC32 verification (the engine-side
    * extra the SQL oracle can't model — strictly more rejections on
    * corrupt data, equal on well-formed). Bounds-checked throughout:
    * a truncated container yields ok=false, never an exception. */
  private[queries] def containerMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    media.select(col("media_id"), col("meta.kind").as("kind"), col("payload"))
      .as[(Long, Int, Array[Byte])]
      .map { case (id, kind, p) =>
        def be32(off: Int): Long =
          ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
            ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)
        val isPng = p.length >= 33 && PngSig.indices.forall(i => p(i) == PngSig(i))
        if (!isPng)
          (id, kind, "raw", None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long], 0L, 0L, true)
        else {
          val width = be32(16); val height = be32(20)
          val bitDepth = (p(24) & 0xFF).toLong; val colorType = (p(25) & 0xFF).toLong
          var pos = 8 // 0-based: first chunk length field
          var nChunks = 0L; var idat = 0L; var last = ""; var ok = true
          while (ok && pos + 8 <= p.length) {
            val len = be32(pos)
            if (pos + 12 + len > p.length) { ok = false }
            else {
              val typ = new String(p, pos + 4, 4, "US-ASCII")
              val crc = new java.util.zip.CRC32
              crc.update(p, pos + 4, 4 + len.toInt)
              if (crc.getValue != be32(pos + 8 + len.toInt)) ok = false
              else {
                if (typ == "IDAT") idat += len
                nChunks += 1; last = typ; pos += 12 + len.toInt
              }
            }
          }
          ok = ok && pos == p.length && last == "IEND"
          (id, kind, "png", Some(width), Some(height), Some(bitDepth),
            Some(colorType), nChunks, idat, ok)
        }
      }
      .toDF("media_id", "kind", "container", "width", "height",
        "bit_depth", "color_type", "n_chunks", "idat_bytes", "ok")
  }
}
