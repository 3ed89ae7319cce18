package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Mp3FrameAuditor unit behaviors (the m12 oracle certifies the
  * corpus walk cross-engine; this pins the branch semantics). */
class Mp3AuditSpec extends AnyFunSuite {

  private def frame(bidx: Int, ridx: Int, pad: Int): Array[Byte] = {
    val kbps = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
      192, 224, 256, 320)(bidx - 1)
    val rate = Array(44100, 48000, 32000)(ridx)
    val flen = (144000L * kbps / rate).toInt + pad
    val f = new Array[Byte](flen)
    f(0) = 0xFF.toByte; f(1) = 0xFB.toByte
    f(2) = ((bidx << 4) | (ridx << 2) | (pad << 1)).toByte
    f
  }

  private def audit(b: Array[Byte]): Map[String, Long] =
    Mp3FrameAuditor.auditFields(1, b).get.toMap

  test("clean stream: ok, census and duration from headers") {
    val b = frame(9, 0, 0) ++ frame(14, 0, 1) ++ frame(1, 0, 0)
    val a = audit(b)
    assert(a("ok") == 1L && a("n_frames") == 3L)
    assert(a("frame_bytes") == b.length.toLong)
    assert(a("sample_rate") == 44100L)
    assert(a("kbps_sum") == (128 + 320 + 32).toLong)
    assert(a("duration_ms") == 3L * 1152 * 1000 / 44100)
  }

  test("ID3v2 prefix is skipped by its syncsafe size") {
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 5) ++
      Array.fill[Byte](5)(0x42)
    val a = audit(tag ++ frame(5, 1, 0))
    assert(a("ok") == 1L && a("n_frames") == 1L && a("sample_rate") == 48000L)
  }

  test("truncated final frame, trailing junk, invalid header: ok=false, prefix counted") {
    val good = frame(9, 0, 0)
    val trunc = audit(good ++ frame(9, 0, 0).dropRight(7))
    assert(trunc("ok") == 0L && trunc("n_frames") == 1L)
    val junk = audit(good ++ Array[Byte](0, 0))
    assert(junk("ok") == 0L && junk("n_frames") == 1L)
    val corrupt = audit(good ++ Array[Byte](0xFF.toByte, 0xFB.toByte, 0x0C, 0, 1, 2))
    assert(corrupt("ok") == 0L && corrupt("n_frames") == 1L)
    val empty = audit(Array.emptyByteArray)
    assert(empty("ok") == 0L && empty("n_frames") == 0L)
  }

  test("the auditor never rasters: mounting it cannot change decode paths") {
    assert(Mp3FrameAuditor.decodeRaster(1, frame(9, 0, 0)).isEmpty)
    // SPI routing: registered auditor answers audits for kind 1 only
    MediaDecoders.ensureRegistered(Mp3FrameAuditor)
    assert(MediaDecoders.auditOf(1, frame(9, 0, 0)).nonEmpty)
    // kind-2 rasters stay stubbed regardless of which auditors are
    // mounted (H264NalAuditor may be registered by its own spec —
    // audits and rasters are independent capabilities)
    assert(MediaDecoders.rasterOf(2, frame(9, 0, 0)).isEmpty)
    assert(MediaDecoders.rasterOf(1, frame(9, 0, 0)).isEmpty)
  }
}
