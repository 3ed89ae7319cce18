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
