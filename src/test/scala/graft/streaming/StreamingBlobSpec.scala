package graft.streaming

import graft.SparkSpec
import graft.multimodal.BlobChunker
import graft.operators.BlobQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for chunk-store ingest: blobs arriving in
  * out-of-order micro-batches through [[BlobStreams.chunkIngestStream]]
  * must accumulate a chunk index whose storage report equals the batch
  * `q_blob_storage` row on the same payloads (chunking is stateless,
  * so the index itself is bit-identical to the batch chunk frame).
  * A re-fetched, CHANGED blob in a later batch supersedes its old
  * chunk set; replaying a micro-batch is a no-op. */
class StreamingBlobSpec extends SparkSpec {
  import spark.implicits._

  private val chunkD = "/tmp/graft_sb_chunks"

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(chunkD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("out-of-order ingest reproduces the batch storage row; " +
    "re-fetch supersedes; replay is a no-op") {
    cleanup()
    val expected = BlobQueries.blobStorage.run(spark, sf0001)
      .collect().head.toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = BlobStreams.chunkIngestStream(
      mem.toDF().toDF("doc_id", "payload"), chunkD).start()
    val all = (0L until 500L).map(id => id -> BlobChunker.syntheticBlob(id))
    val chunks = all.groupBy(_._1 % 3).toSeq.sortBy(-_._1).map(_._2)
    try {
      chunks.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = BlobStreams.storageReport(spark, chunkD).collect().head.toSeq
      assert(got == expected, s"stream report $got != batch $expected")

      // the accumulated index IS the batch chunk frame
      val idx = spark.read.parquet(chunkD)
        .select("doc_id", "start", "len", "h")
        .collect().map(_.toSeq).toSet
      val batchFrame = BlobQueries.chunkFrame(spark, sf0001)
        .collect().map(_.toSeq).toSet
      assert(idx == batchFrame)

      // re-fetch doc 7 with 3 bytes prepended: its chunk set changes,
      // every other doc's contribution stays put
      val changed = Array[Byte](9, 9, 9) ++ BlobChunker.syntheticBlob(7L)
      mem.addData(Seq(7L -> changed)); q.processAllAvailable()
      val rep2 = BlobStreams.storageReport(spark, chunkD).collect().head
      assert(rep2.getLong(0) == 500)
      assert(rep2.getLong(1) == expected(1).asInstanceOf[Long] + 3,
        "superseded doc contributes its NEW length exactly once")
      val doc7 = spark.read.parquet(chunkD)
        .filter($"doc_id" === 7L)
        .withColumn("nb", org.apache.spark.sql.functions.max("ingest_batch")
          .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
        .filter($"ingest_batch" === $"nb")
      assert(doc7.agg(org.apache.spark.sql.functions.sum("len"))
        .collect().head.getLong(0) == changed.length)

      // replay the last micro-batch with ITS batch id
      val before = BlobStreams.storageReport(spark, chunkD).collect().head.toSeq
      BlobStreams.processBatch(
        Seq(7L -> changed).toDF("doc_id", "payload"),
        batchId = chunks.size.toLong, chunkD)
      val after = BlobStreams.storageReport(spark, chunkD).collect().head.toSeq
      assert(after == before, "replaying a batch must be a no-op")
    } finally {
      q.stop()
      cleanup()
    }
  }
}
