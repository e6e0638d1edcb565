package graft.multimodal

import graft.SparkSpec

/** RIFF/AVI header parsing: closed-form round trip, totality on
  * garbage, tolerance of extra preceding chunks. */
class VideoProbeSpec extends SparkSpec {

  test("synthetic AVI parses back to its closed-form parameters") {
    for (id <- Seq(0L, 1L, 15L, 44L, 499L)) {
      val avi = VideoProbe.syntheticAvi(id)
      assert(avi.take(4).toSeq == "RIFF".getBytes.toSeq)
      val row = VideoProbe.probeRow(id, avi)
      val usec = 33333 + (id % 5) * 1000
      assert(row.width == 160 + (id % 16).toInt * 16)
      assert(row.height == 120 + (id % 9).toInt * 8)
      assert(row.n_frames == 100 + (id % 50) * 10)
      assert(row.fps == 1000000L / usec)
      assert(row.duration_ms == row.n_frames * usec / 1000L)
    }
  }

  test("corrupt, truncated, and non-AVI payloads yield sentinels") {
    val good = VideoProbe.syntheticAvi(7L)
    for (bad <- Seq(Array[Byte](1, 2, 3), good.take(16), good.take(40),
                    Array.emptyByteArray,
                    ImageCodec.syntheticPng(7L), // wrong container entirely
                    AudioCodec.syntheticWav(7L))) { // RIFF but WAVE, not AVI
      val row = VideoProbe.probeRow(3L, bad)
      assert(row.width == -1 && row.n_frames == -1L, s"accepted ${bad.length} bytes")
    }
  }

  test("parser walks past unknown chunks to find the header") {
    // splice a junk chunk before the LIST inside the RIFF body
    val base = VideoProbe.syntheticAvi(9L)
    val junk = "JUNK".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val spliced = java.nio.ByteBuffer
      .allocate(base.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base, 0, 12)
      .put(junk)
      .put(base, 12, base.length - 12)
      .array()
    // fix the RIFF size field for the extra bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
                   .getInt(4) + junk.length)
    val row = VideoProbe.probeRow(9L, spliced)
    assert(row.width == 160 + (9 % 16) * 16 && row.n_frames == 100 + (9 % 50) * 10)
  }
}
