package graft.operators

import graft.SparkSpec

/** Binary (1-bit) quantization tier: (a) word packing is bit-exact on a
  * constructed corpus with known thresholds; (b) Hamming ranking matches
  * hand-computed distances; (c) the rescoring theorem — any exact-top-5
  * member that survives into the shortlist must win the rerank, so
  * rescored hits >= raw hits PER QUERY; (d) when the shortlist covers
  * the whole corpus the rescored result IS the exact baseline. */
class BinaryAnnSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, Seq[Float], Int)]): Unit =
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  /** all-`hi` vector with the dims in `flip` set to `lo` instead */
  private def vec(flip: Set[Int]): Seq[Float] =
    (0 until 64).map(i => if (flip(i)) -1f else 1f)

  test("word packing: known thresholds produce exact BIGINT words") {
    val dir = "/tmp/graft_binann_pack"
    // ids 0/2 pin lo=-1, hi=+1 on every dim -> midrange threshold 0
    write(dir, Seq(
      (0L, vec(Set.empty), 0),                            // all bits set
      (1L, vec((1 until 64 by 2).toSet), 0),              // even dims only
      (2L, vec((0 until 64).toSet), 0)))                  // no bits set
    val w = SimilarityQueries.binaryWords(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(w(0L) == ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    assert(w(1L) == ((0x55555555L, 0x55555555L)))
    assert(w(2L) == ((0L, 0L)))
  }

  test("hamming ranking: hand-computed distances, deterministic order") {
    val dir = "/tmp/graft_binann_ham"
    write(dir, Seq(
      (0L, vec(Set.empty), 0),                 // the query
      (11L, vec(Set(0, 1, 2)), 0),             // hamming 3
      (12L, vec(Set(3, 4, 5, 6, 7)), 0),       // hamming 5
      (13L, vec(Set(40)), 0),                  // hamming 1
      (14L, vec(Set(10, 50)), 0),              // hamming 2
      (15L, vec((20 until 30).toSet), 0),      // hamming 10
      (16L, vec((0 until 64).toSet), 0)))      // hamming 64
    val top = SimilarityQueries.binaryTopK.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(top.toSeq == Seq(
      (0L, 13L, 1, 1L), (0L, 14L, 2, 2L), (0L, 11L, 3, 3L),
      (0L, 12L, 4, 5L), (0L, 15L, 5, 10L)))
  }

  test("rescoring theorem: rerank hits >= raw binary hits per query") {
    val raw = SimilarityQueries.binaryRecall.run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rr = SimilarityQueries.binaryRerankRecall.run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw.keySet == rr.keySet && raw.size == 10)
    raw.keys.foreach(q =>
      assert(rr(q) >= raw(q), s"query $q: rescored ${rr(q)} < raw ${raw(q)}"))
  }

  test("shortlist covering the corpus makes the rescored result exact") {
    val dir = "/tmp/graft_binann_cover"
    val rnd = new scala.util.Random(16)
    // 15 candidates per query < binaryRerankK=20 -> shortlist = corpus
    write(dir, (0L until 16L).map(id =>
      (id, Seq.fill(64)(rnd.nextFloat() * 2 - 1), (id % 3).toInt)))
    val bf = SimilarityQueries.bruteForceTopK.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val rr = SimilarityQueries.binaryRerank.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rr == bf, "a corpus-covering shortlist must reproduce the baseline")
  }
}
