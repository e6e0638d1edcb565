package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extract as partition-local batch transforms.
  *
  * The Spark-side architecture is the real thing — explicit schema,
  * partition-preserving `mapPartitions` with per-batch state (the shape a
  * JNI/FFmpeg/PIL decoder needs: init once per partition, stream rows
  * through), codegen-friendly metadata columns. Real codecs plug in for
  * every modality the JDK can decode:
  * [[graft.multimodal.ImageIoDecoder]] (PNG/JPEG/GIF/BMP via
  * `javax.imageio`; oracle-checked q_mm_imageio round trip),
  * [[AudioCodec]] (WAV via `javax.sound.sampled`; q_mm_wav), and
  * [[MjpegCodec]] (MJPEG-AVI video FRAME decode + frame sampling — each
  * movi chunk is a real JPEG; q_mm_mjpeg). [[FakeDecoder]] remains the
  * deterministic stand-in where payloads aren't media (q_mm_decode runs
  * it over text bytes) and for the codecs the JDK genuinely lacks
  * (H.264/VP9/AV1 frame decode — container metadata for those is
  * [[VideoProbe]]).
  */
object Multimodal {

  /** A decoded media row: payload metadata a downstream training pipeline
    * filters/samples on. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      digest: String)

  /** Partition-local "decoder". Real codecs are initialized once per
    * partition (expensive native state) and then stream rows through —
    * this stub has the same lifecycle so the swap is mechanical. */
  trait Decoder extends Serializable {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode: "dimensions" from a stable byte hash.
    * STUB — replace with an image/audio codec in a real deployment. */
  object FakeDecoder extends Decoder {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(payload)
      val hex = dig.map("%02x".format(_)).mkString
      // fake dims in plausible ranges, stable across runs
      val w = 64 + (java.lang.Byte.toUnsignedInt(dig(0)) % 192) * 10
      val h = 64 + (java.lang.Byte.toUnsignedInt(dig(1)) % 108) * 10
      MediaMeta(docId, payload.length, w, h, hex)
    }
  }

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of
    * `text` — the stand-in for an image/audio blob read from storage). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Deterministic fixed-size "feature vector" from payload bytes — the
    * stand-in for an image/audio embedding model. Real plumbing, fake
    * features: 16 dims derived from an md5 digest, normalized to [0,1).
    * STUB — swap for a real encoder; the ANN path downstream (cosine
    * top-k over the resulting vectors) is the real engine surface. */
  def fakeEmbed(payload: Array[Byte], dims: Int = 16): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var dig = md.digest(payload)
    val out = new Array[Float](dims)
    var i = 0
    while (i < dims) {
      if (i % 16 == 0 && i > 0) dig = md.digest(dig) // extend beyond 16 bytes
      out(i) = java.lang.Byte.toUnsignedInt(dig(i % 16)) / 256.0f
      i += 1
    }
    out
  }

  /** Payloads → (doc_id, embedding): the feature-extraction stage of a
    * multimodal pipeline, distributed via mapPartitions like the decode. */
  def embedAll(spark: SparkSession, payloads: DataFrame, dims: Int = 16):
      DataFrame = {
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, fakeEmbed(bytes, dims)) })
      .toDF("doc_id", "embedding")
  }

  /** Decode a payload table into typed metadata. `mapPartitions` keeps
    * the decoder's per-partition init amortized and the data distributed;
    * no row ever visits the driver. */
  def decodeAll(spark: SparkSession, payloads: DataFrame,
                decoder: Decoder = FakeDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init happens here, once per partition
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }
}
