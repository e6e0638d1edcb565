package graft.multimodal

/** Content-defined chunking (CDC) for opaque binary payloads — the
  * rsync/LBFS recipe (Muthitacharoen et al. 2001, "A Low-bandwidth
  * Network File System"): a rolling hash over a sliding byte window
  * declares a chunk boundary wherever `hash < Threshold`, so
  * boundaries depend only on LOCAL content. An insertion early in a
  * blob shifts every downstream byte, which breaks fixed-block dedup
  * (every 512-byte grid block differs) — but CDC boundaries
  * RESYNCHRONIZE at the first content-defined cut after the edit, and
  * every later chunk hashes identically again. BlobSpec proves exactly
  * that on shifted twins where the fixed grid finds zero shared blocks.
  *
  * The rolling hash is a polynomial over the last [[Window]] bytes,
  * `H(i) = Σ b_{i-j}·K^j  mod 2^25` (K = 37) — chosen over the classic gear/
  * Rabin tables because the same sum is computable in ANSI SQL (a
  * 16-row power-table join), keeping the whole operator oracle-exact.
  * No min/max chunk bounds (the FastCDC refinement): bounds make a
  * boundary depend on the PREVIOUS boundary, which is sequential state
  * no window function can express — the documented trade for an exact
  * oracle. Expected chunk length is [[Divisor]] bytes.
  *
  * Chunking is per-row imperative byte work (the [[AudioCodec]]
  * lifecycle class: genuine per-partition logic, not expressible as
  * column functions), and everything downstream — chunk md5, corpus
  * counts, dedup shares — is declarative and codegen'd. */
object BlobChunker {

  /** Rolling window width (bytes). */
  final val Window = 16

  /** Boundary divisor: a position is a boundary when the window hash
    * falls below Mod/Divisor — P = 1/64 ⇒ ~64-byte expected chunks on
    * the synthetic blobs (small, so the sf0.001 corpus still yields
    * thousands of chunks to dedup; a production config would use
    * 2^13..2^16). A THRESHOLD on the full hash, not `% Divisor` on its
    * low bits: a polynomial hash mod 2^k has weak low bits (31^2 ≡ 1
    * mod 64 collapsed the test to an 8×-too-dense byte-sum parity —
    * measured 7.9-byte mean chunks), while the threshold reads the
    * well-mixed high bits (measured 61.8-byte mean, vs 64 expected). */
  final val Divisor = 64

  /** Hash modulus 2^25 — big enough that the threshold test is
    * unbiased, small enough that the oracle's sum-of-products
    * (≤ 16·255·2^25 ≈ 2^37) stays far inside BIGINT. Declared BEFORE
    * [[Threshold]]: object vals initialize in order, so the reverse
    * order would fold Mod = 0 into the threshold. */
  final val Mod = 1 << 25

  /** The boundary threshold Mod/Divisor. */
  final val Threshold: Long = Mod.toLong / Divisor

  private final val K = 37L // order 16 mod 64; 31 has order 2 (31^2 = 961 ≡ 1)
  /** K^Window mod 2^25 — the outgoing byte's weight. */
  private final val KOut: Long = {
    var p = 1L
    (0 until Window).foreach(_ => p = p * K % Mod)
    p
  }

  /** SQL fragment: the (k, pw) rows of `K^k mod 2^25` for
    * k = 0..Window-1 — the oracle's power table. */
  def powerTableSql: String = {
    val rows = (0 until Window).map { k =>
      var p = 1L
      (0 until k).foreach(_ => p = p * K % Mod)
      s"($k, $p)"
    }
    s"(VALUES ${rows.mkString(", ")}) pw(k, pw)"
  }

  /** Deterministic synthetic blob for doc `id` — closed-form so the
    * oracle can replay it (the [[AudioCodec.syntheticWav]] discipline):
    * a per-doc prefix of `1 + id mod 17` bytes (the SHIFT that defeats
    * fixed blocks), then a 512-byte run keyed only by the GROUP
    * `id mod 25` (shared content at different offsets), then a unique
    * tail. Total `700 + (id mod 13)·37` bytes.
    *
    * Bytes are LCG-mixed (middle bits of `seed·A + i·B mod 2^32`) —
    * plain arithmetic progressions mod 256 put the rolling hash into a
    * tiny structured orbit that essentially never hits the boundary
    * mask (measured: ~345-byte chunks instead of ~64, zero boundaries
    * inside the shared run, zero dedup); mixed bytes restore the
    * uniform 1/Divisor boundary rate the CDC analysis assumes. */
  def syntheticBlob(id: Long): Array[Byte] = {
    val total = (700 + (id % 13) * 37).toInt
    val p = (1 + id % 17).toInt
    val g = id % 25
    val out = new Array[Byte](total)
    var i = 0
    while (i < total) {
      val v =
        if (i < p) (id * 2654435761L + i * 40503L) % 4294967296L / 65536 % 256
        else if (i < p + 512)
          (g * 1099087573L + (i - p) * 2654435761L) % 4294967296L / 65536 % 256
        else (id * 1812433253L + i * 2654435761L) % 4294967296L / 65536 % 256
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** Content-defined chunks of a blob: (start, len, byteString) where
    * byteString is the chunk's unsigned bytes joined by '|' — md5'd
    * downstream IN THE PLAN (codegen'd), identically to the oracle's
    * `md5(string_agg(b, '|'))`. The final partial chunk always closes
    * at the last byte. Empty blobs chunk to nothing. */
  def chunks(bytes: Array[Byte]): Seq[(Int, Int, String)] = {
    if (bytes.isEmpty) return Seq.empty
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val in = bytes(i) & 0xff
      h = (h * K + in) % Mod
      if (i >= Window) {
        val out = bytes(i - Window) & 0xff
        h = ((h - out * KOut) % Mod + Mod) % Mod
      }
      if (i >= Window - 1 && h < Threshold) ends += i
      i += 1
    }
    if (ends.isEmpty || ends.last != bytes.length - 1)
      ends += bytes.length - 1
    var start = 0
    ends.toSeq.map { e =>
      val s = start
      start = e + 1
      (s, e - s + 1,
        bytes.slice(s, e + 1).map(b => (b & 0xff).toString).mkString("|"))
    }
  }
}
