package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.multimodal.Multimodal.{Decoder, MediaMeta}

/** REAL image codec over the JDK's built-in `javax.imageio` (PNG, JPEG,
  * GIF, BMP — no external libraries, headless-safe), closing the
  * round-2 "documented stub" gap for the image modality: decode and
  * resize are genuine pixel operations, running partition-local through
  * the same [[Multimodal.decodeAll]] lifecycle as the stub.
  *
  * Totality contract: a corrupt or non-image payload yields sentinel
  * dimensions (-1) instead of throwing — at 100 TB some payloads WILL be
  * garbage, and one bad blob must not kill a 10-hour stage. (Audio/video
  * modalities remain stubbed: the JDK ships no codec for them.)
  *
  * Determinism note for the oracle gate: PNG BYTES are encoder-dependent
  * (compression level, chunk layout), so registered queries never output
  * byte lengths or payload digests of encoded images — only decoded
  * facts (dimensions, pixel values), which are exact by the PNG
  * contract: lossless round-trip makes decoded pixels closed-form
  * computable in DuckDB. */
object ImageCodec {

  // In-memory ImageInputStreams: ImageIO's DEFAULT wraps every
  // InputStream decode in a FileCacheImageInputStream — each per-row
  // decode spills the payload through a temp FILE, so decode cost rides
  // the host's ambient disk load (the 2-3x multimodal bench swings of
  // rounds 8-9). Payloads here are small in-memory byte arrays; the
  // memory cache is strictly better. JVM-wide, set once per class load
  // (executors initialize it on first task touching this object).
  ImageIO.setUseCache(false)

  /** Deterministic single-color synthetic PNG for a document id:
    * width = 16 + id % 32, height = 16 + id % 24, fill color =
    * (id * 2654435761) % 2^24 (Knuth multiplicative hash — replayable
    * as integer arithmetic in any engine). The ENCODED bytes vary by
    * encoder; the DECODED facts don't. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 32).toInt
    val h = 16 + (id % 24).toInt
    val rgb = ((id * 2654435761L) % 16777216L).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic GRADIENT synthetic PNG (same dims as
    * [[syntheticPng]]): gray(x, y) = (id + x + y) % 256 in all three
    * channels — NON-constant pixels, so downstream feature extraction
    * is a real reduction over the whole raster rather than a one-pixel
    * read, while every pixel stays closed-form for the oracle. */
  def syntheticGradientPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 32).toInt
    val h = 16 + (id % 24).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id + x + y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Whole-raster grayscale features of one image. */
  final case class FeatRow(
      doc_id: Long,
      width: Int,
      height: Int,
      mean_gray_milli: Long,
      min_gray: Int,
      max_gray: Int)

  /** Whole-raster grayscale feature extraction — decode, then a real
    * w×h pixel loop (long sum + min + max of the blue channel; the
    * gradient is gray so any channel serves). PNG losslessness makes
    * the mean/min/max exactly the closed-form grid the oracle computes.
    * Corrupt payloads → the -1 sentinel row (same totality contract as
    * [[decodeRow]]). */
  def featureRow(id: Long, payload: Array[Byte]): FeatRow = {
    val decoded =
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    decoded match {
      case None => FeatRow(id, -1, -1, -1L, -1, -1)
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var mn = 255
        var mx = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = img.getRGB(x, y) & 0xff
            sum += g
            if (g < mn) mn = g
            if (g > mx) mx = g
            x += 1
          }
          y += 1
        }
        FeatRow(id, w, h, sum * 1000L / (w.toLong * h), mn, mx)
    }
  }

  /** One perceptual-hash row: the 64-bit average-hash rendered as a
    * 64-char bit string ('' for undecodable payloads). */
  final case class PhashRow(doc_id: Long, phash: String)

  /** 64-bit perceptual average-hash (aHash) over the REAL decoded
    * raster: 8×8 block means (blocks `ci = x*8/w`, `cj = y*8/h` — every
    * block non-empty for w,h ≥ 8), integer milli-means, threshold =
    * floor-mean of the 64 cells, bit = cell above threshold, rendered
    * in (cj, ci) order. Brightness-invariant by construction (the
    * threshold is the image's own mean), which is the point: two
    * images differing only by exposure hash identically. All integer
    * arithmetic so the oracle replays it over the closed-form grid.
    * Totality: corrupt payloads AND decodable images smaller than the
    * 8×8 block grid (e.g. a 1×1 tracking pixel — some blocks would be
    * empty, no meaningful 64-bit signature exists) both degrade to the
    * empty-string sentinel instead of throwing; one odd payload must
    * not kill a streaming ingest task. */
  def aHashRow(id: Long, payload: Array[Byte]): PhashRow = {
    val decoded =
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    decoded match {
      case None => PhashRow(id, "")
      case Some(img) => PhashRow(id, aHashOf(img))
    }
  }

  /** The aHash of an ALREADY-decoded raster — shared by [[aHashRow]]
    * and the per-frame hashing of multi-frame containers
    * ([[GifCodec.frameRows]]); "" for rasters below the 8×8 grid. */
  def aHashOf(img: java.awt.image.BufferedImage): String = {
    if (img.getWidth < 8 || img.getHeight < 8) return ""
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cj = y * 8 / h
      var x = 0
      while (x < w) {
        val k = cj * 8 + x * 8 / w
        sums(k) += img.getRGB(x, y) & 0xff
        cnts(k) += 1
        x += 1
      }
      y += 1
    }
    val cm = Array.tabulate(64)(k => sums(k) * 1000L / cnts(k))
    val thr = cm.sum / 64
    cm.map(v => if (v > thr) '1' else '0').mkString
  }

  /** One decoded image row: real dimensions, the (0,0) pixel's channels,
    * and the dimensions of a genuinely resized thumbnail. */
  final case class ImgRow(
      doc_id: Long,
      width: Int,
      height: Int,
      r: Int,
      g: Int,
      b: Int,
      thumb_w: Int,
      thumb_h: Int)

  private val Bad = (-1, -1, -1, -1, -1, -1, -1)

  /** Decode + resize, total: corrupt payloads produce the -1 sentinel
    * row. Thumbnail target dims use pure integer math (floor division,
    * min 1) so an oracle can replay them; the thumbnail itself is a real
    * `Graphics2D#drawImage` scale whose actual dims are what's
    * reported. */
  def decodeRow(id: Long, payload: Array[Byte], maxDim: Int): ImgRow = {
    val decoded =
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    val (w, h, r, g, b, tw, th) = decoded match {
      case None => Bad
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        val rgb = img.getRGB(0, 0) & 0xffffff
        val m = math.max(w, h)
        val tw0 = math.max(1, w * maxDim / m)
        val th0 = math.max(1, h * maxDim / m)
        val thumb = new BufferedImage(tw0, th0, BufferedImage.TYPE_INT_RGB)
        val g2 = thumb.createGraphics()
        try g2.drawImage(img, 0, 0, tw0, th0, null)
        finally g2.dispose()
        (w, h, rgb >> 16, (rgb >> 8) & 0xff, rgb & 0xff,
         thumb.getWidth, thumb.getHeight)
    }
    ImgRow(id, w, h, r, g, b, tw, th)
  }
}

/** [[Multimodal.Decoder]] implementation backed by `javax.imageio` —
  * drop-in for [[Multimodal.FakeDecoder]] behind the same
  * partition-local lifecycle. Dimensions are real; corrupt payloads
  * yield (-1, -1) instead of throwing. */
object ImageIoDecoder extends Decoder {
  def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val img =
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    img match {
      case Some(i) => MediaMeta(docId, payload.length, i.getWidth, i.getHeight, hex)
      case None => MediaMeta(docId, payload.length, -1, -1, hex)
    }
  }
}
