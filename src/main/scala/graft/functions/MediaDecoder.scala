package graft.functions

/** Pluggable media-decode SPI (r13, VERDICT r12 item 8): the engine's
  * executor kernels decode what the JVM can decode natively (PNG via
  * ImageIO, MJPEG/AVI/WAV via the hand-rolled container readers), but
  * lossy audio/video codecs (mp3, h264, …) have no JVM implementation
  * in this environment — those kinds fall back to deterministic
  * byte-histogram stubs. This SPI is the mount point that closes the
  * gap WITHOUT touching the engine: a deployment drops a decoder
  * backed by its native libs (an ffmpeg JNI binding, a cloud codec
  * service client) on the classpath as a `java.util.ServiceLoader`
  * provider — or registers one programmatically — and every kernel
  * that consults [[MediaDecoders.rasterOf]] starts producing real
  * features for those kinds, on every executor, with no plan change.
  *
  * Contract: decoders run INSIDE executor tasks (the engine's
  * decode-in-executors rule — payload bytes never move to the driver),
  * must be thread-safe, and signal "cannot decode this payload" by
  * returning None — the caller then keeps its deterministic stub (or
  * audit-row) behavior, so a missing/failing decoder can never change
  * committed hashes, only a present one can add real decode.
  */
trait MediaDecoder {

  /** Media kinds (the media table's `meta.kind` ints) this decoder
    * claims. First registered claimant wins a kind. */
  def kinds: Set[Int]

  /** Decode a payload to an 8-bit gray raster (width, height, samples
    * 0..255 row-major). None = payload undecodable by this decoder —
    * the caller falls back to its stub/audit path. */
  def decodeRaster(kind: Int, payload: Array[Byte]): Option[(Int, Int, Array[Int])]

  /** Structural AUDIT without decode — container/frame-header walk
    * (sync words, declared sizes, duration), the ingest-side health
    * check that needs no codec (the m6/m9 pattern). Ordered
    * (field, value) pairs; None = this decoder offers no audit for
    * the payload. Default None: a raster-only decoder stays a
    * raster-only decoder. */
  def auditFields(kind: Int, payload: Array[Byte]): Option[Seq[(String, Long)]] =
    None
}

object MediaDecoders {

  /** Per-JVM registry: ServiceLoader providers discovered once, plus
    * programmatic registrations (tests, embedded deployments). Kept in
    * a per-JVM object — executors discover their own providers from
    * their own classpath, which is exactly the deployment model for a
    * native-lib-backed decoder (the jar + .so ship to executors, not
    * through closure serialization). */
  @volatile private var programmatic: List[MediaDecoder] = Nil

  private lazy val discovered: List[MediaDecoder] = {
    import scala.jdk.CollectionConverters._
    try java.util.ServiceLoader.load(classOf[MediaDecoder]).asScala.toList
    catch { case _: java.util.ServiceConfigurationError => Nil }
  }

  def register(d: MediaDecoder): Unit = synchronized {
    programmatic = d :: programmatic
  }

  /** Register-if-absent (by identity) — idempotent, callable from
    * INSIDE executor tasks: on a real cluster each executor JVM keeps
    * its own registry (the ServiceLoader deployment model), so a
    * kernel that needs a built-in auditor mounts it per-JVM exactly
    * the way a classpath provider would be discovered. */
  def ensureRegistered(d: MediaDecoder): Unit = synchronized {
    if (!programmatic.exists(_ eq d)) programmatic = d :: programmatic
  }

  /** Test hook: drop programmatic registrations (ServiceLoader
    * providers are classpath-static and stay). */
  def clearProgrammatic(): Unit = synchronized { programmatic = Nil }

  private def all: List[MediaDecoder] = programmatic ++ discovered

  /** The decoded raster for (kind, payload) via the first claiming
    * decoder, or None when no decoder claims the kind / the claimant
    * cannot decode the payload. */
  def rasterOf(kind: Int, payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    all.find(_.kinds.contains(kind))
      .flatMap(d => d.decodeRaster(kind, payload))

  /** The structural audit for (kind, payload) via the first claiming
    * decoder that offers one. */
  def auditOf(kind: Int, payload: Array[Byte]): Option[Seq[(String, Long)]] =
    all.iterator.filter(_.kinds.contains(kind))
      .map(_.auditFields(kind, payload))
      .collectFirst { case Some(f) => f }
}

/** The first REAL audit SPI instance (r14, VERDICT r13 item 7): an
  * MPEG-1 Layer III (MP3) frame-header walker. No PCM decode — none
  * is possible pure-JVM here, and none is needed for the ingest-side
  * audit: sync words, per-frame bitrate/sample-rate/padding, frame
  * census, and duration all live in the 4-byte headers (ISO/IEC
  * 11172-3 §2.4.1.3 header layout; frame length in bytes =
  * 144·bitrate/sample_rate + padding for Layer III). An ID3v2 prefix
  * (the common real-world wrapper) is skipped by its syncsafe size.
  *
  * Strict-walk audit semantics (the m9 pattern): `ok` requires at
  * least one frame, a valid header at every step, every frame
  * complete, and the stream consumed exactly — a truncated upload,
  * mid-stream corruption, or trailing junk each read ok=false with
  * the frames counted so far. Deterministic, so the m12 oracle
  * re-walks the same bytes in DuckDB.
  *
  * `decodeRaster` stays None for every payload: mounting the auditor
  * must not change any raster-path behavior (kind-1 rows keep their
  * deterministic stub features — asserted by the unchanged m1 hash).
  */
object Mp3FrameAuditor extends MediaDecoder {

  /** MPEG-1 Layer III bitrates (kbps) by header index 1..14. */
  private val Kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, 0)
  /** MPEG-1 sample rates by header index 0..2 (3 = reserved). */
  private val Rates = Array(44100, 48000, 32000, 0)

  override def kinds: Set[Int] = Set(1) // the media table's audio kind

  override def decodeRaster(kind: Int, payload: Array[Byte])
      : Option[(Int, Int, Array[Int])] = None

  override def auditFields(kind: Int, payload: Array[Byte])
      : Option[Seq[(String, Long)]] = {
    val b = payload
    val n = b.length.toLong
    var pos = 0L
    // ID3v2 prefix: "ID3" maj rev flags + 4-byte syncsafe size
    if (n >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      pos = 10L + (((b(6) & 0x7F).toLong << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F))
    var frames = 0L; var fbytes = 0L; var kbpsSum = 0L; var rate1 = 0L
    var bad = false
    while (!bad && pos + 4 <= n) {
      val p = pos.toInt
      val h0 = b(p) & 0xFF; val h1 = b(p + 1) & 0xFF; val h2 = b(p + 2) & 0xFF
      val bidx = (h2 >> 4) & 15; val ridx = (h2 >> 2) & 3
      val pad = (h2 >> 1) & 1
      val valid = h0 == 0xFF && (h1 & 0xE0) == 0xE0 &&
        ((h1 >> 3) & 3) == 3 && ((h1 >> 1) & 3) == 1 &&
        bidx >= 1 && bidx <= 14 && ridx <= 2
      if (!valid) bad = true
      else {
        val kbps = Kbps(bidx); val rate = Rates(ridx)
        val flen = 144000L * kbps / rate + pad
        if (pos + flen > n) bad = true // truncated final frame
        else {
          if (frames == 0) rate1 = rate
          frames += 1; fbytes += flen; kbpsSum += kbps; pos += flen
        }
      }
    }
    val ok = frames >= 1 && !bad && pos == n
    val durMs = if (rate1 > 0) frames * 1152L * 1000L / rate1 else 0L
    Some(Seq(
      "ok" -> (if (ok) 1L else 0L),
      "n_frames" -> frames,
      "frame_bytes" -> fbytes,
      "sample_rate" -> rate1,
      "kbps_sum" -> kbpsSum,
      "duration_ms" -> durMs))
  }
}

/** The video twin of [[Mp3FrameAuditor]] (r14): an H.264/AVC Annex-B
  * NAL-unit audit — start-code walk, per-NAL header validation
  * (forbidden_zero_bit), unit-type census (SPS/PPS/IDR/slice), and
  * the structural-completeness rule a decodable stream needs (at
  * least one SPS, PPS, and IDR). No entropy decode — none is possible
  * pure-JVM here and none is needed for ingest health: everything
  * audited lives in the byte-aligned start codes (ITU-T H.264 Annex
  * B) and the 1-byte NAL header (§7.3.1).
  *
  * Walk rule (shared verbatim with the m13 DuckDB oracle): start
  * codes are the 3-byte pattern 00 00 01, scanned left-to-right with
  * a 3-byte skip after each hit (the 4-byte form 00 00 00 01 is a
  * zero-prefixed 3-byte code and yields the same hit); a NAL's extent
  * runs from after its start code to the next hit (so a following
  * 4-byte code's lead zero counts with the PREVIOUS unit's extent —
  * harmless for a census; a de-escaper would trim it). A unit is
  * valid when its extent holds a header plus at least one byte and
  * forbidden_zero_bit is 0; invalid units are not typed (they report
  * under n_other). `ok` = stream begins with a start code, zero
  * invalid units, and SPS/PPS/IDR all present.
  */
object H264NalAuditor extends MediaDecoder {

  override def kinds: Set[Int] = Set(2) // the media table's video kind

  override def decodeRaster(kind: Int, payload: Array[Byte])
      : Option[(Int, Int, Array[Int])] = None

  override def auditFields(kind: Int, payload: Array[Byte])
      : Option[Seq[(String, Long)]] = {
    val b = payload
    val n = b.length
    val matches = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < n) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) { matches += i; i += 3 }
      else i += 1
    }
    var nN = 0L; var nSps = 0L; var nPps = 0L; var nIdr = 0L
    var nSlice = 0L; var nOther = 0L; var badN = 0L
    var k = 0
    while (k < matches.length) {
      val h = matches(k) + 3
      val end = if (k + 1 < matches.length) matches(k + 1) else n
      nN += 1
      if (end - h < 2 || (b(h) & 0x80) != 0) badN += 1
      else (b(h) & 0x1F) match {
        case 7 => nSps += 1
        case 8 => nPps += 1
        case 5 => nIdr += 1
        case 1 => nSlice += 1
        case _ => nOther += 1
      }
      k += 1
    }
    val started = matches.nonEmpty &&
      (matches(0) == 0 || (matches(0) == 1 && b(0) == 0))
    val ok = started && badN == 0 && nSps >= 1 && nPps >= 1 && nIdr >= 1
    Some(Seq(
      "ok" -> (if (ok) 1L else 0L),
      "n_nals" -> nN,
      "n_sps" -> nSps,
      "n_pps" -> nPps,
      "n_idr" -> nIdr,
      "n_slice" -> nSlice,
      "n_other" -> (nOther + badN)))
  }
}

/** The built-in SPI instance: the JVM's own ImageIO container readers
  * (PNG et al) behind the [[MediaDecoder]] contract — the reference
  * implementation a deployment's native-backed provider mirrors for
  * the kinds ImageIO cannot read. Not registered by default (the
  * image kernels call ImageIO directly with throw-on-undecodable
  * audit semantics); register it to serve image kinds through the
  * SPI's soft-fallback semantics instead. */
object ImageIODecoder extends MediaDecoder {
  override def kinds: Set[Int] = Set(0)
  override def decodeRaster(kind: Int, payload: Array[Byte])
      : Option[(Int, Int, Array[Int])] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        (w, h, img.getRaster.getSamples(0, 0, w, h, 0, new Array[Int](w * h)))
      }
    } catch {
      // the SPI contract is "None = undecodable": ImageIO plugin readers
      // throw RuntimeExceptions (not just IOException) on truncated
      // containers, and those must fall back, never fail the task
      case scala.util.control.NonFatal(_) => None
    }
}
