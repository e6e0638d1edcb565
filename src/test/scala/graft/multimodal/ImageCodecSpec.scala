package graft.multimodal

import graft.SparkSpec
import javax.imageio.ImageIO
import java.io.ByteArrayInputStream

/** Real-codec coverage: `javax.imageio` round trips, totality on
  * garbage, and the Decoder swap behind the partition-local lifecycle. */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic PNG decodes back to its closed-form dims and color") {
    for (id <- Seq(0L, 1L, 31L, 123L, 499L)) {
      val png = ImageCodec.syntheticPng(id)
      // really a PNG: JDK decoder accepts it and magic bytes match
      assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      val img = ImageIO.read(new ByteArrayInputStream(png))
      assert(img.getWidth == 16 + (id % 32).toInt)
      assert(img.getHeight == 16 + (id % 24).toInt)
      val expectRgb = ((id * 2654435761L) % 16777216L).toInt
      assert((img.getRGB(3, 3) & 0xffffff) == expectRgb) // lossless fill
      val row = ImageCodec.decodeRow(id, png, maxDim = 8)
      assert(row.r == (expectRgb >> 16) && row.g == ((expectRgb >> 8) & 0xff)
             && row.b == (expectRgb & 0xff))
      // thumbnail was genuinely materialized at the integer-math dims
      val m = math.max(row.width, row.height)
      assert(row.thumb_w == math.max(1, row.width * 8 / m))
      assert(row.thumb_h == math.max(1, row.height * 8 / m))
    }
  }

  test("gradient PNG features equal an independent grid computation") {
    for (id <- Seq(0L, 1L, 200L, 255L, 499L)) {
      val row = ImageCodec.featureRow(id, ImageCodec.syntheticGradientPng(id))
      val w = 16 + (id % 32).toInt
      val h = 16 + (id % 24).toInt
      val grid = for (x <- 0 until w; y <- 0 until h)
        yield ((id + x + y) % 256).toInt
      assert(row.width == w && row.height == h)
      assert(row.mean_gray_milli == grid.map(_.toLong).sum * 1000L / (w.toLong * h))
      assert(row.min_gray == grid.min && row.max_gray == grid.max)
    }
  }

  test("featureRow is total on garbage") {
    val row = ImageCodec.featureRow(5L, Array[Byte](9, 9, 9))
    assert(row.width == -1 && row.mean_gray_milli == -1L && row.max_gray == -1)
  }

  test("corrupt and non-image payloads yield sentinel rows, never throw") {
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val truncated = ImageCodec.syntheticPng(7L).take(20)
    for (bad <- Seq(junk, truncated, Array.emptyByteArray)) {
      val row = ImageCodec.decodeRow(9L, bad, maxDim = 8)
      assert(row.width == -1 && row.height == -1 && row.thumb_w == -1)
      val meta = ImageIoDecoder.decode(9L, bad)
      assert(meta.width == -1 && meta.height == -1)
      assert(meta.byte_len == bad.length && meta.digest.length == 32)
    }
  }

  test("aHash is brightness-invariant and structure-sensitive") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def png(w: Int, h: Int)(gray: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = gray(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // same ramp at two exposures -> identical hash (threshold is the
    // image's own mean); inverted ramp -> different hash
    val ramp = ImageCodec.aHashRow(0, png(40, 30)((x, y) => x + y)).phash
    val bright = ImageCodec.aHashRow(1, png(40, 30)((x, y) => x + y + 60)).phash
    val inverted = ImageCodec.aHashRow(2, png(40, 30)((x, y) => 180 - x - y)).phash
    assert(ramp.length == 64 && ramp.count(_ == '1') > 0 && ramp.count(_ == '0') > 0)
    assert(ramp == bright, "exposure shift changed the perceptual hash")
    assert(ramp != inverted, "structurally different images collided")
    // totality: garbage payload yields the sentinel, not a throw
    assert(ImageCodec.aHashRow(3, Array[Byte](1, 2, 3)).phash == "")
    // totality: a VALID image smaller than the 8x8 block grid (1x1
    // tracking pixel, 4x4 icon) also degrades to the sentinel — empty
    // blocks would otherwise divide by zero mid-stream
    assert(ImageCodec.aHashRow(4, png(1, 1)((_, _) => 128)).phash == "")
    assert(ImageCodec.aHashRow(5, png(4, 12)((x, y) => x + y)).phash == "")
  }

  test("ImageIoDecoder drops into decodeAll's partition-local lifecycle") {
    val payloads = spark.range(40)
      .as[Long]
      .mapPartitions(_.map(id => (id, ImageCodec.syntheticPng(id))))
      .toDF("doc_id", "payload")
      .repartition(7)
    val out = Multimodal.decodeAll(spark, payloads, ImageIoDecoder)
      .collect().sortBy(_.doc_id)
    assert(out.length == 40)
    out.foreach { m =>
      assert(m.width == 16 + (m.doc_id % 32).toInt)
      assert(m.height == 16 + (m.doc_id % 24).toInt)
    }
  }
}
