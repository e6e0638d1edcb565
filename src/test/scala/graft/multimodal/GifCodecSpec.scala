package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real animated-GIF frame decode: geometry AND the per-frame aHash are
  * palette-exact (GIF is lossless ≤256 colors), so the closed-form
  * prefix-cell contract — frame i of doc id hashes to
  * `'1'*nb + '0'*(64-nb)` with `nb = 8 + (id+i) % 48` — must hold
  * bit-for-bit through encode → sequence write → read-back → aHash.
  * Corrupt payloads must degrade to the single sentinel row. */
class GifCodecSpec extends AnyFunSuite {

  private def expectedHash(id: Long, i: Int): String = {
    val nb = GifCodec.brightCells(id, i)
    "1" * nb + "0" * (64 - nb)
  }

  test("sampled frames decode with exact geometry, stride indices, and " +
    "the closed-form palette-exact aHash") {
    for (id <- Seq(0L, 7L, 13L, 42L, 499L)) {
      val gif = GifCodec.syntheticGif(id)
      val rows = GifCodec.frameRows(id, gif, stride = 2)
      val expectedIdx = (0 until GifCodec.nFrames(id) by 2).toSeq
      assert(rows.map(_.frame_idx) == expectedIdx, s"id=$id")
      rows.foreach { r =>
        assert(r.width == GifCodec.frameW(id) &&
          r.height == GifCodec.frameH(id), s"id=$id frame=${r.frame_idx}")
        assert(r.ahash == expectedHash(id, r.frame_idx),
          s"id=$id frame=${r.frame_idx}")
      }
    }
  }

  test("stride 1 decodes every frame; larger strides subsample") {
    val id = 5L
    val gif = GifCodec.syntheticGif(id)
    val all = GifCodec.frameRows(id, gif, stride = 1)
    assert(all.size == GifCodec.nFrames(id))
    assert(all.map(_.frame_idx) == (0 until GifCodec.nFrames(id)).toSeq)
    assert(GifCodec.frameRows(id, gif, stride = 3).map(_.frame_idx) ==
      (0 until GifCodec.nFrames(id) by 3).toSeq)
  }

  test("per-frame hashes differ across frames exactly by the bright-cell " +
    "prefix delta (Hamming = |Δnb|)") {
    val id = 11L
    val rows = GifCodec.frameRows(id, GifCodec.syntheticGif(id), stride = 1)
    assert(rows.size >= 2)
    for (Seq(a, b) <- rows.sliding(2)) {
      val hamming = a.ahash.zip(b.ahash).count { case (x, y) => x != y }
      val dnb = math.abs(
        GifCodec.brightCells(id, a.frame_idx) -
          GifCodec.brightCells(id, b.frame_idx))
      assert(hamming == dnb, s"frames ${a.frame_idx}/${b.frame_idx}")
    }
  }

  test("corrupt and non-GIF payloads degrade to the sentinel row, never " +
    "a throw") {
    val sentinel = Seq(GifCodec.GifFrameRow(1L, -1, -1, -1, ""))
    assert(GifCodec.frameRows(1L, Array.emptyByteArray) == sentinel)
    assert(GifCodec.frameRows(1L, "not an image".getBytes) == sentinel)
    // truncated mid-stream: the JDK reader throws on the cut frame; the
    // totality rule maps that to the sentinel instead of propagating —
    // and anything short of the sentinel must still honor the
    // closed-form contract (no garbage frames from a half-read stream)
    val gif = GifCodec.syntheticGif(3L)
    val cut = gif.take(gif.length / 2)
    val rows = GifCodec.frameRows(3L, cut, stride = 1)
    assert(rows.nonEmpty, "totality: truncated payloads yield rows")
    if (rows != Seq(GifCodec.GifFrameRow(3L, -1, -1, -1, ""))) {
      assert(rows.map(_.frame_idx) == (0 until rows.size).toSeq,
        "decoded prefix must be a contiguous frame prefix")
      rows.foreach { r =>
        assert(r.width == GifCodec.frameW(3L) &&
          r.height == GifCodec.frameH(3L) &&
          r.ahash == expectedHash(3L, r.frame_idx),
          s"truncated decode produced a garbage frame: $r")
      }
    }
  }
}
