package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** H264NalAuditor unit behaviors (the m13 oracle certifies the corpus
  * walk cross-engine; this pins the branch semantics). */
class H264AuditSpec extends AnyFunSuite {

  private def nal(fourByte: Boolean, hdr: Int, body: Byte*): Array[Byte] =
    (if (fourByte) Array[Byte](0, 0, 0, 1) else Array[Byte](0, 0, 1)) ++
      Array(hdr.toByte) ++ body.toArray

  private def audit(b: Array[Byte]): Map[String, Long] =
    H264NalAuditor.auditFields(2, b).get.toMap

  test("clean stream: census and ok; 3- and 4-byte start codes equivalent") {
    val b = nal(fourByte = true, 0x67, 0x10, 0x11) ++ // SPS
      nal(fourByte = false, 0x68, 0x20) ++            // PPS
      nal(fourByte = true, 0x65, 0x30, 0x31, 0x32) ++ // IDR
      nal(fourByte = false, 0x41, 0x40) ++            // slice
      nal(fourByte = false, 0x06, 0x50)               // SEI -> other
    val a = audit(b)
    assert(a("ok") == 1L && a("n_nals") == 5L)
    assert(a("n_sps") == 1L && a("n_pps") == 1L && a("n_idr") == 1L)
    assert(a("n_slice") == 1L && a("n_other") == 1L)
  }

  test("forbidden_zero_bit, leading junk, missing SPS, empty NAL: ok=false") {
    val good = nal(fourByte = true, 0x67, 0x10) ++ nal(fourByte = false, 0x68, 0x20) ++
      nal(fourByte = false, 0x65, 0x30)
    assert(audit(good)("ok") == 1L)
    // forbidden bit: counted under n_other, not typed
    val fb = audit(good ++ nal(fourByte = false, 0xC1, 0x40))
    assert(fb("ok") == 0L && fb("n_other") == 1L && fb("n_slice") == 0L)
    // leading garbage: census intact, started=false
    val junk = audit(Array[Byte](0x19, 0x2A) ++ good)
    assert(junk("ok") == 0L && junk("n_nals") == 3L)
    // missing SPS
    val noSps = audit(nal(fourByte = true, 0x68, 0x20) ++
      nal(fourByte = false, 0x65, 0x30))
    assert(noSps("ok") == 0L && noSps("n_sps") == 0L)
    // an empty unit (start code at end of stream) is invalid
    val empty = audit(good ++ Array[Byte](0, 0, 1))
    assert(empty("ok") == 0L && empty("n_nals") == 4L && empty("n_other") == 1L)
    // no start code at all
    val none = audit(Array[Byte](0x10, 0x20, 0x30))
    assert(none("ok") == 0L && none("n_nals") == 0L)
  }

  test("the auditor never rasters; SPI routes kind 2 audits, kind 1 untouched") {
    assert(H264NalAuditor.decodeRaster(2, nal(fourByte = true, 0x67, 0x10)).isEmpty)
    MediaDecoders.ensureRegistered(H264NalAuditor)
    assert(MediaDecoders.auditOf(2, nal(fourByte = true, 0x67, 0x10)).nonEmpty)
    assert(MediaDecoders.rasterOf(2, nal(fourByte = true, 0x67, 0x10)).isEmpty)
  }

  test("totality: random bytes never throw and always terminate") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 2000) {
      val b = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val a = audit(b)
      assert(a("n_nals") >= a("n_sps") + a("n_pps") + a("n_idr") +
        a("n_slice") + a("n_other") - a("n_nals") || a("n_nals") >= 0)
      // census partition: typed + other == n_nals
      assert(a("n_sps") + a("n_pps") + a("n_idr") + a("n_slice") +
        a("n_other") == a("n_nals"))
    }
    // mp3 walker totality too (same fuzz contract)
    for (_ <- 0 until 2000) {
      val b = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val a = Mp3FrameAuditor.auditFields(1, b).get.toMap
      assert(a("n_frames") >= 0 && a("frame_bytes") >= 0)
    }
  }
}
