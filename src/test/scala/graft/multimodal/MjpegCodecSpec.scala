package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real MJPEG frame decode: geometry must survive the lossy codec
  * exactly, sampled indices must follow the stride, pixel averages must
  * land within lossy-codec tolerance of the encoded solid color, and
  * corrupt payloads must degrade rather than throw. */
class MjpegCodecSpec extends AnyFunSuite {

  test("sampled frames decode with exact geometry and stride indices") {
    for (id <- Seq(0L, 7L, 13L, 42L)) {
      val avi = MjpegCodec.syntheticMjpegAvi(id)
      val rows = MjpegCodec.frameRows(id, avi, stride = 2)
      val expectedIdx = (0 until MjpegCodec.nFrames(id) by 2).toSeq
      assert(rows.map(_.frame_idx) == expectedIdx, s"id=$id")
      assert(rows.forall(r => r.ok &&
        r.width == MjpegCodec.frameW(id) && r.height == MjpegCodec.frameH(id)))
    }
  }

  test("stride 1 decodes every frame; larger strides subsample") {
    val id = 5L
    val avi = MjpegCodec.syntheticMjpegAvi(id)
    assert(MjpegCodec.frameRows(id, avi, stride = 1).size == MjpegCodec.nFrames(id))
    assert(MjpegCodec.frameRows(id, avi, stride = 3).map(_.frame_idx) ==
      (0 until MjpegCodec.nFrames(id) by 3).toSeq)
  }

  test("decoded pixels land within lossy-codec tolerance of the source") {
    val id = 9L
    val avi = MjpegCodec.syntheticMjpegAvi(id)
    for (i <- 0 until MjpegCodec.nFrames(id)) {
      val (r, g, b) = MjpegCodec.frameColor(id, i)
      val Some((dr, dg, db)) = MjpegCodec.decodeAvgColor(avi, i)
      assert(math.abs(dr - r) <= 12 && math.abs(dg - g) <= 12 &&
        math.abs(db - b) <= 12,
        s"frame $i: encoded ($r,$g,$b) decoded ($dr,$dg,$db)")
    }
  }

  test("corrupt and non-AVI payloads degrade without throwing") {
    assert(MjpegCodec.frameRows(1L, Array.emptyByteArray).isEmpty)
    assert(MjpegCodec.frameRows(1L, "not a movie".getBytes).isEmpty)
    val avi = MjpegCodec.syntheticMjpegAvi(3L)
    // truncate mid-movi: the walker returns what it safely parsed
    val cut = avi.take(avi.length - 7)
    val rows = MjpegCodec.frameRows(3L, cut, stride = 1)
    assert(rows.size <= MjpegCodec.nFrames(3L)) // no throw is the contract
    // corrupt one frame's JPEG bytes in place: that row flags ok=false
    val broken = avi.clone()
    val moviAt = {
      // find the first 00dc chunk and trash its payload start
      val s = new String(broken.map(_.toChar))
      s.indexOf("00dc")
    }
    assert(moviAt > 0)
    java.util.Arrays.fill(broken, moviAt + 8, moviAt + 16, 0.toByte)
    val withBad = MjpegCodec.frameRows(3L, broken, stride = 1)
    assert(withBad.exists(!_.ok) || withBad.size < MjpegCodec.nFrames(3L))
  }
}
