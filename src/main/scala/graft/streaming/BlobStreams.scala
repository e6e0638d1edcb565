package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Streaming chunk-store ingest — the storage-grain twin of
  * [[MultimodalStreams]]: binary payloads arrive in micro-batches, each
  * is content-defined-chunked ONCE, partition-locally, on arrival
  * ([[graft.multimodal.BlobChunker.chunks]] — bytes never shuffle), and
  * the (doc_id, start, len, md5) chunk records enter a persisted chunk
  * index partitioned by ingest batch. Chunking is stateless per blob,
  * so streamed chunk records are BIT-IDENTICAL to the batch
  * `q_blob_chunks` frame on the same payloads — the WinnowStreams
  * contract, not the frozen-model class.
  *
  * The dedup/storage report is a VIEW over the accumulated index
  * ([[storageReport]]), so it is never final-on-arrival: a chunk's
  * refcount grows as later carriers land, exactly as the batch
  * `q_blob_storage` would count them. A doc_id RE-INGESTED in a later
  * batch (crawl re-fetch of a changed file) supersedes its older chunk
  * set — only the newest ingest of each doc counts, so a re-fetched
  * blob neither double-counts its unchanged chunks nor strands its
  * stale ones (the image-phash newest-wins rule at chunk grain).
  *
  * Replay safety: each micro-batch overwrites its OWN
  * `ingest_batch=<id>` partition — a re-applied batch rewrites
  * identical rows in place. */
object BlobStreams {

  /** Chunk one batch of (doc_id, payload) rows — the only place bytes
    * are touched; everything downstream is chunk records. The md5 is
    * the codegen'd column function, identical to the batch path. */
  private[streaming] def chunkRowsOf(batch: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        graft.multimodal.BlobChunker.chunks(payload).map {
          case (start, len, bstr) => (id, start, len, bstr)
        }
      })
      .toDF("doc_id", "start", "len", "bstr")
      .withColumn("h", md5(col("bstr")))
      .drop("bstr")
  }

  /** One micro-batch application, exposed apart from the stream wiring
    * so tests can replay a batch (same `batchId`) directly. */
  def processBatch(batch: DataFrame, batchId: Long, chunkDir: String): Unit =
    chunkRowsOf(batch)
      .write.mode("overwrite").parquet(s"$chunkDir/ingest_batch=$batchId")

  /** Continuous wiring: a stream of (doc_id, payload) blobs applied
    * micro-batch by micro-batch through [[processBatch]]. */
  def chunkIngestStream(blobs: DataFrame, chunkDir: String): DataStreamWriter[Row] =
    blobs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(batch, batchId, chunkDir)
      }

  /** Each doc's NEWEST ingested chunk set (the superseding rule). */
  private def latest(s: SparkSession, chunkDir: String): DataFrame = {
    val p = new Path(chunkDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(p) && fs.listStatus(p).nonEmpty,
      s"no ingested chunk index at $chunkDir")
    s.read.parquet(chunkDir)
      .withColumn("nb", max("ingest_batch").over(Window.partitionBy("doc_id")))
      .filter(col("ingest_batch") === col("nb"))
      .select("doc_id", "start", "len", "h")
  }

  /** The storage-tier headline over everything ingested so far — the
    * same six columns as the batch `q_blob_storage`, computed from the
    * accumulated index (one hash-agg on h; the per-doc window above is
    * partitioned on doc_id, never corpus-wide). */
  def storageReport(s: SparkSession, chunkDir: String): DataFrame = {
    val ch = latest(s, chunkDir)
    val tot = ch.agg(
      countDistinct(col("doc_id")).as("n_blobs"),
      sum("len").as("bytes_total"),
      count(lit(1)).as("n_chunks"))
    val u = ch.groupBy("h").agg(min("len").as("len"))
      .agg(count(lit(1)).as("n_chunks_unique"), sum("len").as("bytes_unique"))
    tot.crossJoin(broadcast(u))
      .select(col("n_blobs"), col("bytes_total"), col("n_chunks"),
        col("n_chunks_unique"), col("bytes_unique"),
        expr("100 - bytes_unique * 100 div bytes_total").as("saving_pct"))
  }
}
