package graft.streaming

import graft.SparkSpec
import graft.operators.ChunkingQueries
import org.apache.spark.sql.functions._

/** Stream/batch parity for tokenize-on-arrival: documents encoded in
  * out-of-order micro-batches against the frozen trained tokenizer
  * must equal the batch `q_bpe_encode` rows exactly; replay must be
  * idempotent; OOV words in new documents must fall back to character
  * pieces rather than vanish. */
class StreamingEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val encD = "/tmp/graft_senc_idx"

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(encD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("out-of-order streamed encode equals the batch q_bpe_encode") {
    cleanup()
    val vocab = ChunkingQueries.bpeVocab(spark, sf0001)
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    // two out-of-order batches covering the corpus
    TokenizeStreams.encodeBatch(
      docs.filter(col("doc_id") >= 250), 0L, vocab, encD)
    TokenizeStreams.encodeBatch(
      docs.filter(col("doc_id") < 250), 1L, vocab, encD)
    val got = TokenizeStreams.encoded(spark, encD)
    val want = ChunkingQueries.bpeEncode.run(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed encode diverges from the batch pass")

    // replay idempotence
    TokenizeStreams.encodeBatch(
      docs.filter(col("doc_id") >= 250), 0L, vocab, encD)
    val again = TokenizeStreams.encoded(spark, encD)
    assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty,
      "replayed batch changed the encoded corpus")
  }

  test("OOV words fall back to character pieces, never dropped") {
    cleanup()
    val vocab = ChunkingQueries.bpeVocab(spark, sf0001)
    TokenizeStreams.encodeBatch(
      Seq((999999L, "zqxzqxzq")).toDF("doc_id", "text"),
      5L, vocab, encD)
    val row = TokenizeStreams.encoded(spark, encD)
      .filter(col("doc_id") === 999999L).collect()
    assert(row.length == 1)
    assert(row(0).getLong(1) == 8L, "OOV word must price at char length")
    assert(row(0).getString(2) == "z q x z q x z q",
      s"OOV word must decompose to characters, got '${row(0).getString(2)}'")
  }
}
