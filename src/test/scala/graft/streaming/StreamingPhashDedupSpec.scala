package graft.streaming

import graft.SparkSpec
import graft.operators.MultimodalQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Stream/batch parity for perceptual-hash image dedup: images arriving
  * in micro-batches — OUT of doc_id order, so later batches carry
  * smaller ids that retroactively win their clusters — must yield
  * exactly the batch `q_mm_img_phash` verdict set; replaying a
  * micro-batch must change nothing; corrupt payloads must neither
  * throw nor join a verdict cluster. */
class StreamingPhashDedupSpec extends SparkSpec {
  import spark.implicits._

  private val hashD = "/tmp/graft_sphash_idx"

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(hashD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("out-of-order micro-batched ingest equals the batch verdicts") {
    cleanup()
    val expected = MultimodalQueries.imagePhash.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val images = mem.toDF().toDF("doc_id")
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, graft.multimodal.ImageCodec.syntheticGradientPng(id))))
      .toDF("doc_id", "payload")
    val q = MultimodalStreams.phashIngestStream(images, hashD).start()
    try {
      // high ids first: every later batch undercuts earlier keepers
      mem.addData(300L until 500L: _*); q.processAllAvailable()
      mem.addData(100L until 300L: _*); q.processAllAvailable()
      mem.addData(0L until 100L: _*); q.processAllAvailable()
    } finally q.stop()

    val got = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == expected, "streamed verdicts diverge from the batch pass")
  }

  /** Direct (stream-wiring-free) ingest of an id range as one batch. */
  private def ingest(range: Range, batchId: Long): Unit =
    MultimodalStreams.processBatch(
      spark.range(range.start, range.end).as[Long]
        .mapPartitions(_.map(id =>
          (id, graft.multimodal.ImageCodec.syntheticGradientPng(id))))
        .toDF("doc_id", "payload"),
      batchId, hashD)

  test("replaying a micro-batch is idempotent; corrupt payloads excluded") {
    cleanup() // self-contained: build the index via direct batch applies
    ingest(0 until 250, batchId = 0L)
    ingest(250 until 500, batchId = 1L)
    val before = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(before.size == 500)

    // replay: re-apply batch 1's slice under the same batch id
    ingest(250 until 500, batchId = 1L)
    val after = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(after == before, "replayed batch changed the verdict set")

    // corrupt payload: ingests as the sentinel, never joins a cluster
    val garbage = Seq((9999L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    MultimodalStreams.processBatch(garbage, batchId = 99L, hashD)
    val v = MultimodalStreams.verdicts(spark, hashD)
    assert(v.filter(v("doc_id") === 9999L).count() == 0,
      "corrupt payload surfaced in the verdicts")
    assert(v.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .toSet == before, "garbage ingest disturbed the verdict set")
  }

  test("a doc re-ingested in a later batch keeps one row, newest signature") {
    cleanup()
    ingest(0 until 100, batchId = 0L)
    // doc 42 re-fetched in a later crawl batch with DIFFERENT pixels
    // (simulated by another id's payload): last writer must win, and
    // exactly one verdict row must exist for it
    val refetch = Seq(
      (42L, graft.multimodal.ImageCodec.syntheticGradientPng(7L)))
      .toDF("doc_id", "payload")
    MultimodalStreams.processBatch(refetch, batchId = 5L, hashD)
    val rows = MultimodalStreams.verdicts(spark, hashD)
      .filter(col("doc_id") === 42L)
      .collect().map(r => (r.getString(1), r.getBoolean(2)))
    assert(rows.length == 1, s"expected one verdict row, got ${rows.length}")
    val want = graft.multimodal.ImageCodec.aHashRow(
      42L, graft.multimodal.ImageCodec.syntheticGradientPng(7L)).phash
    assert(rows(0)._1 == want, "re-ingest did not take the newest signature")
    // total stays one row per distinct doc
    assert(MultimodalStreams.verdicts(spark, hashD).count() == 100)
  }

  test("a corrupt re-fetch cannot erase an older valid signature (ADVICE r9)") {
    cleanup()
    ingest(0 until 100, batchId = 0L)
    val before = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    // doc 42's re-crawl returns garbage bytes in a LATER batch: the
    // older valid signature must survive — the doc stays in the
    // verdicts and its hash cluster's keeper does not flip
    MultimodalStreams.processBatch(
      Seq((42L, Array[Byte](0, 0, 0))).toDF("doc_id", "payload"),
      batchId = 7L, hashD)
    val after = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(after == before,
      "corrupt re-fetch of a previously-valid image changed the verdicts")
  }
}
