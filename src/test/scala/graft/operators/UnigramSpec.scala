package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The unigram-LM lattice tokenizer: the map-side Viterbi DP's
  * objective (fewest pieces, then highest total score, then earliest
  * split) pinned on hand-built lattices, the long-word character
  * fallback, and the trained artifact's conservation laws over the
  * real corpus — every segmentation must re-concatenate to its word
  * and spend only vocabulary pieces. */
class UnigramSpec extends SparkSpec {

  private def segOf(word: String, vocab: Map[String, Long]): String = {
    val df = spark.range(1).select(
      lit(word).as("w"), typedLit(vocab).as("vm"))
    df.select(UnigramQueries.viterbiSeg(col("w"), col("vm")).as("seg"))
      .collect().head.getString(0)
  }

  test("lattice prefers fewest pieces, then highest score") {
    // "ab ab" (2 pieces) beats every 3/4-piece split
    assert(segOf("abab", Map("a" -> 10L, "b" -> 8L, "ab" -> 20L, "ba" -> 5L))
      === "ab ab")
    // among equal-count splits, the higher-scoring pieces win:
    // "xy z" (30+1) vs "x yz" (1+50) -> "x yz"
    assert(segOf("xyz",
      Map("x" -> 1L, "y" -> 1L, "z" -> 1L, "xy" -> 30L, "yz" -> 50L))
      === "x yz")
  }

  test("equal count and score tie-breaks on the earliest split") {
    // "a aa" and "aa a" both cost (2 pieces, score 12); the DP's final
    // position tie-break picks the smaller split index j=1 -> "a aa"
    assert(segOf("aaa", Map("a" -> 5L, "aa" -> 7L)) === "a aa")
  }

  test("single-character reachability holds even at score zero") {
    assert(segOf("qq", Map("q" -> 0L)) === "q q")
  }

  test("words beyond the lattice cap fall back to character pieces") {
    val w = "x" * (UnigramQueries.MaxWordLen + 1)
    val df = spark.range(1).select(lit(w).as("w"),
      typedLit(Map("x" -> 3L)).as("vm"))
    val seg = df.select(
      when(length(col("w")) > UnigramQueries.MaxWordLen,
        UnigramQueries.charSeg(col("w")))
        .otherwise(UnigramQueries.viterbiSeg(col("w"), col("vm"))).as("seg"))
      .collect().head.getString(0)
    assert(seg === Seq.fill(UnigramQueries.MaxWordLen + 1)("x").mkString(" "))
  }

  test("trained artifact conserves every word and spends only kept pieces") {
    val vocab = UnigramQueries.unigramVocab(spark, sf0001)
      .select("w", "seg", "n_tokens").collect()
    assert(vocab.nonEmpty)
    val kept = UnigramQueries.unigramPieces(spark, sf0001)
      .select("piece").collect().map(_.getString(0)).toSet
    vocab.foreach { r =>
      val (w, seg, n) = (r.getString(0), r.getString(1), r.getLong(2))
      val pieces = seg.split(" ")
      assert(pieces.mkString("") === w, s"'$seg' does not rebuild '$w'")
      assert(pieces.length.toLong === n)
      if (w.length <= UnigramQueries.MaxWordLen)
        pieces.foreach(p => assert(kept.contains(p), s"piece '$p' not kept"))
      else
        pieces.foreach(p => assert(p.length == 1, s"long word piece '$p'"))
    }
  }

  test("pruned vocabulary is chars plus at most KeepMulti used pieces") {
    val rows = UnigramQueries.unigramPieces(spark, sf0001)
      .select("piece", "n_used").collect()
    val multi = rows.filter(_.getString(0).length > 1)
    assert(multi.length <= UnigramQueries.KeepMulti)
    multi.foreach(r => assert(r.getLong(1) > 0,
      s"kept multi piece '${r.getString(0)}' was never used"))
  }

  test("encode emits a token stream consistent with the vocabulary") {
    val enc = UnigramQueries.unigramEncode.run(spark, sf0001)
      .select("doc_id", "n_tokens", "uni_text").collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getLong(1) === r.getString(2).split(" ").length.toLong)
    }
  }
}
