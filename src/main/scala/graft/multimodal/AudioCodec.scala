package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec over the JDK's built-in `javax.sound.sampled`
  * (WAV/PCM — no external libraries), the audio twin of [[ImageCodec]]:
  * genuine header+stream decode, partition-local, total on garbage.
  * PCM WAV is lossless, so every decoded fact (sample rate, channels,
  * frame count, duration, first sample value) is closed-form computable
  * by an oracle — the q_mm_wav round trip is hash-verified end to end.
  * (Video remains stubbed: the JDK ships no video codec.) */
object AudioCodec {

  /** One decoded audio row: the metadata a training pipeline
    * filters/samples on (-1 sentinels for undecodable payloads). */
  final case class AudioRow(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      first_sample: Int)

  /** Deterministic synthetic 16-bit PCM WAV for a document id:
    * rate = 8000 + (id%8)·1000, channels = 1 + id%2,
    * frames = 400 + (id%100)·4, sample i = ((id·31 + i·7) % 65536) −
    * 32768 interleaved across channels. Every parameter is integer
    * arithmetic an oracle replays; the WAV container is lossless. */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = 8000 + (id % 8).toInt * 1000
    val channels = 1 + (id % 2).toInt
    val frames = 400 + (id % 100).toInt * 4
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      val s = (((id * 31 + i.toLong * 7) % 65536L) - 32768L).toShort
      data(2 * i) = (s & 0xff).toByte            // little-endian PCM
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload's FULL 16-bit PCM stream to (index, sample)
    * pairs in interleaved order — the input to windowed feature
    * extraction (energy / zero-crossing / peak). Real codec work: the
    * bytes come back through `javax.sound.sampled`'s stream decode, not
    * from replaying the generator. Total on garbage: undecodable or
    * non-16-bit payloads yield an empty iterator (a bad blob
    * contributes no feature rows rather than killing the stage). */
  def samples(payload: Array[Byte]): Iterator[(Long, Int)] = {
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) Iterator.empty
        else {
          val bytes = ais.readAllBytes()
          val big = fmt.isBigEndian
          Iterator.tabulate(bytes.length / 2) { i =>
            val s =
              if (big) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
              else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
            (i.toLong, s.toInt)
          }
        }
      } finally ais.close()
    } catch { case _: Exception => Iterator.empty }
  }

  /** One audio fingerprint row: 64-bit band-energy sign hash, or the
    * "" sentinel for undecodable/too-short payloads. */
  final case class WavHashRow(doc_id: Long, phash: String)

  /** Perceptual audio fingerprint — the WAV twin of
    * [[ImageCodec.aHashRow]]: the decoded interleaved 16-bit PCM stream
    * is cut into 64 equal-share windows (sample i → window i·64/n),
    * each window reduced to its mean energy in milli-units
    * (Σs² · 1000 / count, integer floor), and bit k set when window k's
    * energy exceeds the 64-window mean — a 64-char bit string that is
    * loudness-PROFILE-invariant the way aHash is brightness-invariant,
    * so re-encoded or offset-shifted audio with the same energy
    * envelope collapses to the same signature. Pure integer arithmetic
    * throughout (max Σs²·1000 ≈ 2.7e13 per window — Long-safe), so an
    * oracle replays it closed-form over the synthetic PCM formula.
    * Streams with fewer than 64 samples or undecodable payloads yield
    * the "" sentinel — audit-visible, never a dedup cluster. */
  def phashRow(id: Long, payload: Array[Byte]): WavHashRow = {
    val sm = samples(payload).toArray
    val n = sm.length
    if (n < 64) WavHashRow(id, "")
    else {
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var i = 0
      while (i < n) {
        val k = (i.toLong * 64L / n).toInt
        val s = sm(i)._2.toLong
        sums(k) += s * s
        cnts(k) += 1
        i += 1
      }
      val vm = Array.tabulate(64)(k => sums(k) * 1000L / cnts(k))
      val thr = vm.sum / 64
      WavHashRow(id, vm.map(v => if (v > thr) '1' else '0').mkString)
    }
  }

  /** Decode a WAV payload's header + first frame, total: corrupt or
    * non-audio payloads yield the -1 sentinel row instead of throwing
    * (one bad blob must not kill a 100 TB stage). duration_ms uses
    * integer floor division — replayable as `frames * 1000 // rate`. */
  def decodeRow(id: Long, payload: Array[Byte]): AudioRow = {
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val rate = math.round(fmt.getSampleRate)
        val first = if (frames > 0 && fmt.getSampleSizeInBits == 16) {
          // reads must cover whole frames (frameSize = channels × 2);
          // the first sample is the frame's first 16-bit word
          val b = new Array[Byte](fmt.getFrameSize)
          if (ais.read(b) == b.length) {
            val s = if (fmt.isBigEndian) ((b(0) << 8) | (b(1) & 0xff)).toShort
                    else ((b(1) << 8) | (b(0) & 0xff)).toShort
            s.toInt
          } else -1
        } else -1
        AudioRow(id, rate, fmt.getChannels, frames,
                 frames * 1000L / rate, first)
      } finally ais.close()
    } catch {
      case _: Exception => AudioRow(id, -1, -1, -1L, -1L, -1)
    }
  }
}
