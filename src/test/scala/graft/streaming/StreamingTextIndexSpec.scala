package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.TextQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for the inverted index: documents streamed
  * through [[TextStreams.indexStream]] must accumulate EXACTLY the
  * batch positional postings, phrase queries over the streamed index
  * must equal the batch phrase plan, a re-crawled document must
  * supersede its old postings wholesale (including terms the new
  * version DROPPED), and a replayed batch must rewrite its partition
  * to the same bytes. */
class StreamingTextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val postD = "/tmp/graft_sti_postings"

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(postD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def postKey(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1), r.getLong(2),
      r.getSeq[Int](3).toList)

  test("streamed postings equal the batch index; phrase queries agree") {
    cleanup()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val expected = TextQueries.invertedIndexPlan(spark, sf0001)
      .collect().map(postKey).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = TextStreams.indexStream(
      mem.toDF().toDF("doc_id", "text"), postD).start()
    val rows = docs.as[(Long, String)].collect()
    try {
      for (wave <- 0 until 3) {
        mem.addData(rows.filter(_._1 % 3 == wave).toIndexedSeq)
        q.processAllAvailable()
      }
      val got = TextStreams.termPostings(spark, postD, Nil)
        .collect().map(postKey).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")

      // phrase search over the STREAMED index == the batch phrase plan
      val phrase = Seq("stream", "data")
      val batchHits = TextQueries
        .phraseHitsFrom(TextQueries.invertedIndexPlan(spark, sf0001), phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamHits = TextQueries
        .phraseHitsFrom(TextStreams.termPostings(spark, postD, phrase), phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchHits.nonEmpty && streamHits == batchHits)

      // BM25 over the STREAMED index == the registered batch query
      // (same integer scoring, lengths folded from the postings)
      val batchBm25 = TextQueries.bm25.run(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val streamBm25 = TextStreams
        .bm25(spark, postD, Seq("scan", "join", "quantile"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batchBm25.nonEmpty && streamBm25 == batchBm25,
        s"bm25 parity broke: missing=${(batchBm25 -- streamBm25).take(3)}")

      // replay the last wave with ITS batch id: same partition bytes
      TextStreams.processBatch(
        rows.filter(_._1 % 3 == 2).toIndexedSeq.toDF("doc_id", "text"),
        batchId = 2L, postD)
      assert(TextStreams.termPostings(spark, postD, Nil)
        .collect().map(postKey).toSet == expected,
        "replayed micro-batch changed the index")
    } finally { q.stop(); cleanup() }
  }

  test("index compaction bounds partitions without changing any answer") {
    cleanup()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .filter(col("doc_id") < 120)
    val rows = docs.as[(Long, String)].collect()
    for (wave <- 0 until 4)
      TextStreams.processBatch(
        rows.filter(_._1 % 4 == wave).toIndexedSeq.toDF("doc_id", "text"),
        batchId = wave.toLong, postD)
    val before = TextStreams.termPostings(spark, postD, Nil)
      .collect().map(postKey).toSet

    // fold batches 0..2 into partition 2; batch 3 stays replay-eligible
    assert(TextStreams.compactIndex(spark, postD).contains(2L))
    val p = new org.apache.hadoop.fs.Path(postD)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p)
      .map(_.getPath.getName).filter(_.startsWith("ingest_batch=")).sorted
    assert(parts.toSeq == Seq("ingest_batch=2", "ingest_batch=3"), parts.toSeq)
    assert(TextStreams.termPostings(spark, postD, Nil)
      .collect().map(postKey).toSet == before, "compaction changed the index")

    // the replay-eligible NEWEST batch re-applies harmlessly post-fold
    TextStreams.processBatch(
      rows.filter(_._1 % 4 == 3).toIndexedSeq.toDF("doc_id", "text"),
      batchId = 3L, postD)
    assert(TextStreams.termPostings(spark, postD, Nil)
      .collect().map(postKey).toSet == before, "replay after fold diverged")

    // and the stream keeps growing on top of the folded base
    TextStreams.processBatch(
      Seq((999L, "brand new doc")).toDF("doc_id", "text"), batchId = 4L, postD)
    assert(TextStreams.termPostings(spark, postD, Seq("brand")).count() == 1)
    cleanup()
  }

  test("a re-crawled doc supersedes wholesale, dropped terms included") {
    cleanup()
    TextStreams.processBatch(
      Seq((1L, "alpha beta gamma"), (2L, "delta")).toDF("doc_id", "text"),
      batchId = 0L, postD)
    // re-crawl doc 1: 'beta' is DROPPED, 'omega' added
    TextStreams.processBatch(
      Seq((1L, "alpha omega")).toDF("doc_id", "text"), batchId = 1L, postD)
    val terms = TextStreams.termPostings(spark, postD, Nil)
      .select("doc_id", "term").as[(Long, String)].collect().toSet
    assert(terms == Set(
      (1L, "alpha"), (1L, "omega"), (2L, "delta")),
      s"got $terms")
    // the dropped term must not resurrect through a term-filtered lookup
    assert(TextStreams.termPostings(spark, postD, Seq("beta")).count() == 0,
      "a term dropped by the re-crawl resurfaced in term lookup")
    cleanup()
  }
}
