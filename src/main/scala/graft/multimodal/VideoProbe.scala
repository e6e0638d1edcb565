package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Video CONTAINER metadata extraction: a real RIFF/AVI header parser
  * (byte-level, no codec needed — container metadata is plain structured
  * bytes), completing the multimodal tier's metadata story: image and
  * audio decode are real JDK codecs ([[ImageCodec]], [[AudioCodec]]);
  * for video the JDK ships no codec, so FRAME decode stays stubbed while
  * header parsing — what a corpus pass filters on (resolution, frame
  * count, fps, duration) — is genuine.
  *
  * Parser shape: walk the RIFF chunk tree (fourcc + little-endian size),
  * find `avih` (the MainAVIHeader), read its fixed-offset fields. Total:
  * corrupt or non-AVI payloads yield -1 sentinels, never a throw. */
object VideoProbe {

  final case class VideoRow(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Long,
      fps: Long,
      duration_ms: Long)

  /** Deterministic minimal AVI for a document id: RIFF(AVI ) →
    * LIST(hdrl) → avih with id-derived width/height/frame-count/rate —
    * every field closed-form for the oracle. */
  def syntheticAvi(id: Long): Array[Byte] = {
    val width = 160 + (id % 16).toInt * 16
    val height = 120 + (id % 9).toInt * 8
    val usecPerFrame = 33333 + (id % 5).toInt * 1000
    val frames = 100 + (id % 50).toInt * 10
    val avihBody = new Array[Byte](56)
    val ab = ByteBuffer.wrap(avihBody).order(ByteOrder.LITTLE_ENDIAN)
    ab.putInt(0, usecPerFrame)
    ab.putInt(16, frames)
    ab.putInt(24, 1)      // dwStreams
    ab.putInt(32, width)
    ab.putInt(36, height)
    val hdrlSize = 4 + 8 + 56 // "hdrl" + avih chunk header + body
    val riffSize = 4 + 8 + hdrlSize // "AVI " + LIST header + list body
    val out = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(hdrlSize)
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII")).putInt(56)
      .put(avihBody)
    out.array()
  }

  private val Bad = VideoRow(-1L, -1, -1, -1L, -1L, -1L)

  /** Parse the container header; -1 sentinels on anything malformed. */
  def probeRow(id: Long, payload: Array[Byte]): VideoRow = {
    def fourcc(b: ByteBuffer, pos: Int): String =
      if (pos + 4 > b.capacity()) ""
      else new String(Array(b.get(pos), b.get(pos + 1), b.get(pos + 2),
                            b.get(pos + 3)), "US-ASCII")
    try {
      val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return Bad.copy(doc_id = id)
      // walk top-level chunks; descend into LIST chunks (skip their type
      // word) looking for the avih header
      var stack = List(12 -> math.min(payload.length, 12 + b.getInt(4) - 4))
      while (stack.nonEmpty) {
        val (start, end) = stack.head
        stack = stack.tail
        var pos = start
        while (pos + 8 <= end) {
          val cc = fourcc(b, pos)
          val size = b.getInt(pos + 4)
          if (size < 0 || pos + 8 + size > end) return Bad.copy(doc_id = id)
          if (cc == "LIST") stack ::= (pos + 12) -> (pos + 8 + size)
          else if (cc == "avih" && size >= 40) {
            val usec = b.getInt(pos + 8).toLong
            val frames = b.getInt(pos + 8 + 16).toLong
            val width = b.getInt(pos + 8 + 32)
            val height = b.getInt(pos + 8 + 36)
            if (usec <= 0) return Bad.copy(doc_id = id)
            return VideoRow(id, width, height, frames,
                            1000000L / usec, frames * usec / 1000L)
          }
          pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
        }
      }
      Bad.copy(doc_id = id)
    } catch { case _: Exception => Bad.copy(doc_id = id) }
  }
}
