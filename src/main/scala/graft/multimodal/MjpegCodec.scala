package graft.multimodal

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** REAL video FRAME decode for MJPEG-AVI — the one video codec the JDK
  * can genuinely decode: an MJPEG container's `movi` chunks are plain
  * JPEG images, and `javax.imageio` ships a JPEG codec. This closes the
  * frame-decode gap for MJPEG; H.264/VP9/AV1 frame decode remains
  * impossible without native codec libraries (documented — the
  * container/header tier for those stays [[VideoProbe]]).
  *
  * Decode = the same RIFF chunk walk as [[VideoProbe]] down to
  * LIST(movi), then every `stride`-th video chunk (`##dc`/`##db`)
  * decodes through ImageIO — FRAME SAMPLING, the corpus-pass shape
  * (a filter-or-featurize pass reads every k-th frame, not all of
  * them). Frame dimensions survive JPEG exactly (lossy pixels, lossless
  * geometry), so the registered query's outputs are closed-form for the
  * oracle; pixel fidelity is a spec-level tolerance check, as lossy
  * codecs demand. Corrupt payloads yield ok=false rows, never a throw
  * (the [[ImageCodec]] totality rule). */
object MjpegCodec {

  // Same rule as [[ImageCodec]]: never let a per-frame JPEG decode
  // spill through ImageIO's default temp-FILE stream cache.
  ImageIO.setUseCache(false)

  final case class FrameRow(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, ok: Boolean)

  /** Deterministic per-id geometry: frames and dims the oracle can
    * restate in SQL. */
  def nFrames(id: Long): Int = 2 + (id % 3).toInt
  def frameW(id: Long): Int = 16 + (id % 8).toInt * 4
  def frameH(id: Long): Int = 12 + (id % 5).toInt * 4

  /** Solid fill color for frame `i` of doc `id` (Knuth-hash spread). */
  def frameColor(id: Long, i: Int): (Int, Int, Int) = {
    val v = ((id * 31 + i) * 2654435761L) % 16777216L
    ((v / 65536L).toInt, ((v / 256L) % 256L).toInt, (v % 256L).toInt)
  }

  /** A real MJPEG-AVI for a document id: RIFF(AVI ) → LIST(hdrl){avih}
    * + LIST(movi){ one `00dc` chunk per frame, each a REAL ImageIO-
    * encoded JPEG of a solid-color frame }. */
  def syntheticMjpegAvi(id: Long): Array[Byte] = {
    val (w, h, n) = (frameW(id), frameH(id), nFrames(id))
    val jpegs = (0 until n).map { i =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val (r, g, b) = frameColor(id, i)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val aviH = new Array[Byte](56)
    val ab = ByteBuffer.wrap(aviH).order(ByteOrder.LITTLE_ENDIAN)
    ab.putInt(0, 40000) // usec/frame (25 fps)
    ab.putInt(16, n)
    ab.putInt(24, 1)
    ab.putInt(32, w)
    ab.putInt(36, h)
    val moviBody = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val hdrlBody = 4 + 8 + 56
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val out = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffBody)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(hdrlBody)
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII")).putInt(56).put(aviH)
      .put("LIST".getBytes("US-ASCII")).putInt(moviBody)
      .put("movi".getBytes("US-ASCII"))
    jpegs.foreach { j =>
      out.put("00dc".getBytes("US-ASCII")).putInt(j.length).put(j)
      if ((j.length & 1) == 1) out.put(0.toByte) // RIFF word alignment
    }
    out.array()
  }

  /** Decode every `stride`-th video frame of an MJPEG-AVI payload.
    * Malformed containers or undecodable frames produce ok=false rows
    * (geometry -1) rather than throwing. */
  def frameRows(id: Long, payload: Array[Byte], stride: Int = 2): Seq[FrameRow] = {
    def fourcc(b: ByteBuffer, pos: Int): String =
      if (pos + 4 > b.capacity()) ""
      else new String(Array(b.get(pos), b.get(pos + 1), b.get(pos + 2),
                            b.get(pos + 3)), "US-ASCII")
    try {
      val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return Seq.empty
      // find LIST(movi)
      var movi: Option[(Int, Int)] = None
      var stack = List(12 -> math.min(payload.length, 12 + b.getInt(4) - 4))
      while (stack.nonEmpty && movi.isEmpty) {
        val (start, end) = stack.head
        stack = stack.tail
        var pos = start
        while (pos + 8 <= end && movi.isEmpty) {
          val cc = fourcc(b, pos)
          val size = b.getInt(pos + 4)
          if (size < 0 || pos + 8 + size > end) return Seq.empty
          if (cc == "LIST") {
            if (fourcc(b, pos + 8) == "movi") movi = Some((pos + 12, pos + 8 + size))
            else stack ::= (pos + 12) -> (pos + 8 + size)
          }
          pos += 8 + size + (size & 1)
        }
      }
      movi match {
        case None => Seq.empty
        case Some((start, end)) =>
          val rows = Seq.newBuilder[FrameRow]
          var pos = start
          var idx = 0
          while (pos + 8 <= end) {
            val cc = fourcc(b, pos)
            val size = b.getInt(pos + 4)
            if (size < 0 || pos + 8 + size > end) return rows.result()
            if (cc.endsWith("dc") || cc.endsWith("db")) {
              if (idx % stride == 0) {
                val img =
                  try ImageIO.read(
                    new ByteArrayInputStream(payload, pos + 8, size))
                  catch { case _: Exception => null }
                rows += (if (img == null) FrameRow(id, idx, -1, -1, ok = false)
                         else FrameRow(id, idx, img.getWidth, img.getHeight, ok = true))
              }
              idx += 1
            }
            pos += 8 + size + (size & 1)
          }
          rows.result()
      }
    } catch { case _: Exception => Seq.empty }
  }

  /** Average color of a decoded frame (spec-level fidelity checks —
    * lossy JPEG pixels have no place in an exact oracle). */
  def decodeAvgColor(payload: Array[Byte], frameIdx: Int): Option[(Int, Int, Int)] = {
    def fourcc(b: ByteBuffer, pos: Int): String =
      new String(Array(b.get(pos), b.get(pos + 1), b.get(pos + 2), b.get(pos + 3)),
        "US-ASCII")
    try {
      val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      var stack = List(12 -> payload.length)
      var idx = 0
      while (stack.nonEmpty) {
        val (start, end) = stack.head
        stack = stack.tail
        var pos = start
        while (pos + 8 <= end) {
          val cc = fourcc(b, pos)
          val size = b.getInt(pos + 4)
          if (cc == "LIST") stack ::= (pos + 12) -> (pos + 8 + size)
          else if (cc.endsWith("dc") || cc.endsWith("db")) {
            if (idx == frameIdx) {
              val img = ImageIO.read(new ByteArrayInputStream(payload, pos + 8, size))
              if (img == null) return None
              var (sr, sg, sb, np) = (0L, 0L, 0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  np += 1
                  x += 1
                }
                y += 1
              }
              return Some(((sr / np).toInt, (sg / np).toInt, (sb / np).toInt))
            }
            idx += 1
          }
          pos += 8 + size + (size & 1)
        }
      }
      None
    } catch { case _: Exception => None }
  }
}
