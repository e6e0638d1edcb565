package graft.streaming

import graft.SparkSpec
import graft.operators.MultimodalQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Stream/batch parity for audio fingerprint dedup — the WAV twin of
  * [[StreamingPhashDedupSpec]]: PCM payloads arriving in out-of-order
  * micro-batches must yield exactly the batch `q_mm_wav_phash` verdict
  * set; replay must be idempotent; corrupt payloads must stay out of
  * verdict clusters without erasing older valid signatures. */
class StreamingWavDedupSpec extends SparkSpec {
  import spark.implicits._

  private val hashD = "/tmp/graft_swav_idx"

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(hashD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("out-of-order micro-batched WAV ingest equals the batch verdicts") {
    cleanup()
    val expected = MultimodalQueries.wavPhash.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val wavs = mem.toDF().toDF("doc_id")
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, graft.multimodal.AudioCodec.syntheticWav(id))))
      .toDF("doc_id", "payload")
    val q = MultimodalStreams.wavPhashIngestStream(wavs, hashD).start()
    try {
      // high ids first: later batches undercut earlier keepers
      mem.addData(300L until 500L: _*); q.processAllAvailable()
      mem.addData(0L until 300L: _*); q.processAllAvailable()
    } finally q.stop()

    val got = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == expected, "streamed WAV verdicts diverge from the batch pass")
  }

  /** Direct (stream-wiring-free) ingest of an id range as one batch. */
  private def ingest(range: Range, batchId: Long): Unit =
    MultimodalStreams.processWavBatch(
      spark.range(range.start, range.end).as[Long]
        .mapPartitions(_.map(id =>
          (id, graft.multimodal.AudioCodec.syntheticWav(id))))
        .toDF("doc_id", "payload"),
      batchId, hashD)

  test("WAV replay is idempotent; corrupt re-fetch keeps the old signature") {
    cleanup()
    ingest(0 until 200, batchId = 0L)
    val before = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(before.size == 200)

    ingest(0 until 200, batchId = 0L) // restart replay
    // a later-batch corrupt re-fetch must not erase the valid signature
    MultimodalStreams.processWavBatch(
      Seq((42L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload"),
      batchId = 3L, hashD)
    val after = MultimodalStreams.verdicts(spark, hashD)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(after == before,
      "replay or corrupt re-fetch disturbed the WAV verdict set")
    // a never-valid doc stays excluded
    MultimodalStreams.processWavBatch(
      Seq((9999L, Array[Byte](1))).toDF("doc_id", "payload"),
      batchId = 4L, hashD)
    assert(MultimodalStreams.verdicts(spark, hashD)
      .filter(col("doc_id") === 9999L).count() == 0)
  }
}
