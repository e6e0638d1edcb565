package graft.multimodal

import graft.SparkSpec
import graft.operators.BlobQueries

/** Content-defined chunking: pins (a) chunker totality (reconstruction,
  * conservation, short/empty edges), (b) THE CDC property — an
  * insertion shifts every byte yet chunks resynchronize at the next
  * content-defined cut, while a fixed-size grid loses every block —
  * and (c) the query-level invariants on the real corpus. */
class BlobSpec extends SparkSpec {

  private def md5(s: String) =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("chunks reconstruct the blob exactly; edges are total") {
    (0L until 50L).foreach { id =>
      val b = BlobChunker.syntheticBlob(id)
      val ch = BlobChunker.chunks(b)
      assert(ch.map(_._2).sum == b.length, s"conservation broke for $id")
      // contiguity + byte-exact reconstruction
      var pos = 0
      ch.foreach { case (s, len, bstr) =>
        assert(s == pos)
        assert(bstr == b.slice(s, s + len).map(x => (x & 0xff).toString)
          .mkString("|"))
        pos = s + len
      }
    }
    assert(BlobChunker.chunks(Array.empty[Byte]).isEmpty)
    val tiny = Array[Byte](1, 2, 3) // shorter than the window: one chunk
    assert(BlobChunker.chunks(tiny).map(t => (t._1, t._2)) == Seq((0, 3)))
  }

  test("insertion resync: shifted blob re-shares every chunk after the " +
    "first cut; a fixed-size grid shares nothing") {
    val base = BlobChunker.syntheticBlob(42L)
    val shifted = Array[Byte](9, 9, 9) ++ base // 3-byte insertion at the front
    val a = BlobChunker.chunks(base).map(_._3).map(md5).toSet
    val b = BlobChunker.chunks(shifted).map(_._3).map(md5).toSet
    val shared = a intersect b
    // everything after the first content-defined cut resynchronizes:
    // at most the first chunk (plus hash-accidental boundary churn in
    // the window straddling the edit) differs
    assert(shared.size >= a.size - 2,
      s"resync failed: ${a.size} chunks, only ${shared.size} survive a 3-byte shift")

    def grid(bytes: Array[Byte]) =
      bytes.grouped(64).map(g => md5(g.map(x => (x & 0xff).toString)
        .mkString("|"))).toSet
    assert((grid(base) intersect grid(shifted)).isEmpty,
      "a 3-byte shift should destroy every fixed-grid block — " +
        "otherwise this corpus does not demonstrate why CDC exists")
  }

  test("same-group blobs share run chunks at different offsets; " +
    "cross-group blobs share nothing") {
    // ids 1 and 26: same group (1 % 25), prefixes 2 vs 10 bytes
    def hashes(id: Long) =
      BlobChunker.chunks(BlobChunker.syntheticBlob(id)).map(_._3).map(md5).toSet
    val sameGroup = hashes(1L) intersect hashes(26L)
    assert(sameGroup.size >= 3,
      s"shared 512-byte run should yield several common chunks: $sameGroup")
    assert((hashes(1L) intersect hashes(2L)).isEmpty,
      "different groups share no content, hence no chunks")
  }

  test("query invariants on the real corpus: every blob dedups into its " +
    "group, storage saving is the unique-chunk complement") {
    val dedup = BlobQueries.blobDedup.run(spark, sf0001).collect()
    assert(dedup.length == 500)
    dedup.foreach { r =>
      assert(r.getLong(3) >= 1, s"every blob has 19 group partners: $r")
      assert(r.getLong(4) <= r.getLong(1) && r.getLong(5) <= 100)
    }
    val st = BlobQueries.blobStorage.run(spark, sf0001).collect().head
    assert(st.getLong(0) == 500)
    assert(st.getLong(4) < st.getLong(1), "dedup must save bytes")
    assert(st.getLong(5) == 100 - st.getLong(4) * 100 / st.getLong(1))
    // chunk profile consistent with the dedup frame
    val prof = BlobQueries.blobChunks.run(spark, sf0001).collect()
    assert(prof.map(_.getLong(2)).sum == st.getLong(2))
    assert(prof.map(_.getLong(1)).sum == st.getLong(1))

    // the control: a fixed 64-byte grid on the same corpus saves a
    // fraction of what CDC does (only shift-aligned id pairs dedup)
    val grid = BlobQueries.blobGrid.run(spark, sf0001).collect().head
    assert(grid.getLong(1) == st.getLong(1), "same corpus, same raw bytes")
    assert(grid.getLong(5) * 3 < st.getLong(5),
      s"grid saving ${grid.getLong(5)}% should trail CDC ${st.getLong(5)}% badly")
  }
}
