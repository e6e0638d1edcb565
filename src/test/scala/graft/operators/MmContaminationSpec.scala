package graft.operators

import graft.SparkSpec

/** Planted-leak pins for image-grain benchmark contamination: an exact
  * copy and a Hamming-2 near-copy of an eval signature MUST be flagged,
  * a Hamming-4 look-alike and a far hash MUST NOT, sentinels never
  * match, and multi-signature documents report their closest leak. */
class MmContaminationSpec extends SparkSpec {

  import spark.implicits._

  private val P = "1" * 32 + "0" * 32

  private def flip(h: String, idxs: Int*): String =
    idxs.foldLeft(h)((s, i) =>
      s.updated(i - 1, if (s(i - 1) == '1') '0' else '1'))

  test("planted leaks are flagged, near-misses and sentinels are not") {
    val sigs = Seq(
      (97L, P),                      // eval signature (97 % 97 = 0)
      (194L, P),                     // second eval doc, same pixels
      (0L, ""),                      // eval sentinel: must never match
      (5L, flip(P, 1, 2)),           // train, Hamming 2 → LEAK
      (6L, P),                       // train, exact copy → LEAK (d=0)
      (7L, flip(P, 1, 2, 3, 4)),     // train, Hamming 4 → clean
      (8L, "0" * 32 + "1" * 32),     // train, far → clean
      (9L, ""),                      // train sentinel → excluded
      (10L, flip(P, 1, 2, 3)),       // train multi-sig doc: d=3 ...
      (10L, flip(P, 5)))             // ... and d=1 → min_hamming 1
      .toDF("doc_id", "phash")
    val got = MmContaminationQueries.contaminationFrom(sigs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set(5L, 6L, 10L),
      s"flagged set diverges from the plant: ${got.keySet}")
    // both eval docs carry the leaked pixels: n_eval_docs = 2, first 97
    assert(got(5L) == (2L, 2L, 97L), s"doc 5: ${got(5L)}")
    assert(got(6L) == (2L, 0L, 97L), s"doc 6 (exact copy): ${got(6L)}")
    assert(got(10L) == (2L, 1L, 97L), s"doc 10 (multi-sig min): ${got(10L)}")
  }

  test("a leak concentrated in one band still pigeonholes into another") {
    // 3 flips all inside band 1 (bits 17..19): bands 0, 2, 3 agree —
    // the pigeonhole guarantee at the edge of the threshold
    val sigs = Seq((97L, P), (5L, flip(P, 17, 18, 19)))
      .toDF("doc_id", "phash")
    val got = MmContaminationQueries.contaminationFrom(sigs).collect()
    assert(got.length == 1 && got(0).getLong(0) == 5L &&
      got(0).getLong(2) == 3L, s"edge leak missed: ${got.toSeq}")
  }
}
