package graft.streaming

import graft.SparkSpec
import graft.operators.UnigramQueries
import org.apache.spark.sql.functions._

/** Stream/batch parity for the unigram twin of tokenize-on-arrival:
  * out-of-order micro-batches against the frozen trained lattice must
  * equal the batch `q_unigram_encode` rows exactly; replay must be
  * idempotent; an OOV word runs the real lattice inference (learned
  * pieces compress it), and a word with an untrained character prices
  * as character pieces rather than vanishing. */
class StreamingUnigramSpec extends SparkSpec {
  import spark.implicits._

  private val encD = "/tmp/graft_suni_idx"

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(encD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("out-of-order streamed unigram encode equals the batch pass") {
    cleanup()
    val vocab = UnigramQueries.unigramVocab(spark, sf0001)
    val scores = TokenizeStreams.unigramScores(spark, sf0001)
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    TokenizeStreams.uniEncodeBatch(
      docs.filter(col("doc_id") >= 250), 0L, vocab, scores, encD)
    TokenizeStreams.uniEncodeBatch(
      docs.filter(col("doc_id") < 250), 1L, vocab, scores, encD)
    val got = TokenizeStreams.uniEncoded(spark, encD)
    val want = UnigramQueries.unigramEncode.run(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed unigram encode diverges from the batch pass")

    // replay idempotence
    TokenizeStreams.uniEncodeBatch(
      docs.filter(col("doc_id") >= 250), 0L, vocab, scores, encD)
    val again = TokenizeStreams.uniEncoded(spark, encD)
    assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty,
      "replayed batch changed the encoded corpus")
  }

  test("OOV words run the frozen lattice: learned pieces compress them") {
    cleanup()
    val vocab = UnigramQueries.unigramVocab(spark, sf0001)
    val scores = TokenizeStreams.unigramScores(spark, sf0001)
    // the strongest kept multi-char piece, embedded in a novel word of
    // otherwise-known characters
    val best = UnigramQueries.unigramPieces(spark, sf0001)
      .filter(length(col("piece")) > 1)
      .orderBy(col("n_used").desc, col("piece"))
      .select("piece").collect().head.getString(0)
    val knownChar = UnigramQueries.unigramPieces(spark, sf0001)
      .filter(length(col("piece")) === 1)
      .orderBy(col("piece")).select("piece").collect().head.getString(0)
    val word = s"$knownChar$best$best$knownChar"
    assert(vocab.filter(col("w") === word).count() == 0, "fixture not OOV")
    TokenizeStreams.uniEncodeBatch(
      Seq((999999L, word)).toDF("doc_id", "text"), 3L, vocab, scores, encD)
    val row = TokenizeStreams.uniEncoded(spark, encD)
      .filter(col("doc_id") === 999999L).collect()(0)
    val toks = row.getString(2).split(" ")
    assert(toks.mkString("") === word, "OOV encode must conserve the word")
    // the embedded learned pieces witness a 4-piece segmentation
    // (char, best, best, char); the DP must do at least that well —
    // which only lattice inference, not a char fallback, can achieve
    assert(row.getLong(1) <= 4,
      s"OOV lattice inference not applied: '${row.getString(2)}'")
    assert(row.getLong(1) < word.length,
      s"OOV word with learned pieces must beat char pricing: '${row.getString(2)}'")
  }

  test("untrained characters price as character pieces, never dropped") {
    cleanup()
    val vocab = UnigramQueries.unigramVocab(spark, sf0001)
    val scores = TokenizeStreams.unigramScores(spark, sf0001)
    val kept = UnigramQueries.unigramPieces(spark, sf0001)
      .select("piece").collect().map(_.getString(0)).toSet
    assert(!kept.contains("ß") && !kept.contains("ø"), "fixture chars trained?")
    TokenizeStreams.uniEncodeBatch(
      Seq((999998L, "ßøß over")).toDF("doc_id", "text"),
      4L, vocab, scores, encD)
    val row = TokenizeStreams.uniEncoded(spark, encD)
      .filter(col("doc_id") === 999998L).collect()(0)
    assert(row.getString(2).startsWith("ß ø ß "),
      s"unseen-char word must degrade to characters: '${row.getString(2)}'")
  }
}
