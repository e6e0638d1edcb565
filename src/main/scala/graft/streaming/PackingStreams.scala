package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.operators.ShardPacking

/** Streaming sequence packing — the continuous twin of
  * `q_pack_sequences` for the daily-crawl shape: each micro-batch of
  * curated (doc_id, toks) rows APPENDS to the global token stream at
  * the stored tail offset, so sequence ids keep growing monotonically
  * across batches and no earlier sequence is ever rewritten. Within a
  * batch the order is the same deterministic (md5 bucket, doc_id)
  * permutation the batch pass uses; across batches the order is
  * arrival order — the honest streaming contract (a stream cannot know
  * the global permutation of documents it has not seen).
  *
  * State discipline: per-batch START offsets persist in an `offsets`
  * side table (one row per batch: batch_id, start_offset, batch_toks).
  * A REPLAYED batch (restart recovery) finds its own recorded start
  * offset and rewrites its span partition in place — idempotent, no
  * sequence drift, no dependence on the streaming checkpoint. The
  * batch-parity contract (StreamingPackingSpec): streaming batches
  * b1, b2, … equal ONE batch packing of their concatenation in arrival
  * order, span for span. */
object PackingStreams {

  private def offsetsPath(stateDir: String) = s"$stateDir/offsets"
  private def spansPath(stateDir: String) = s"$stateDir/spans"

  /** Stored (batch_id, start_offset, batch_toks) rows; empty frame with
    * the right schema when nothing has been ingested yet. */
  private[streaming] def readOffsets(s: SparkSession, stateDir: String): DataFrame = {
    val p = new Path(offsetsPath(stateDir))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      s.read.parquet(offsetsPath(stateDir))
    else {
      import s.implicits._
      Seq.empty[(Long, Long, Long)].toDF("batch_id", "start_offset", "batch_toks")
    }
  }

  /** One micro-batch application (exposed for replay tests). `batch`
    * must carry (doc_id, toks > 0). */
  def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
                   L: Long = 512L): Unit = {
    val s = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("toks").cast("long").as("toks"))
      .filter(col("toks") > 0)
    val prior = readOffsets(s, stateDir).filter(col("batch_id") =!= batchId)
    // a replayed batch reuses ITS recorded start; a new batch starts at
    // the stored tail (sum over prior batches — a batches-count-sized
    // one-row aggregate, never corpus-sized)
    val recorded = readOffsets(s, stateDir)
      .filter(col("batch_id") === batchId)
      .select("start_offset").collect().headOption.map(_.getLong(0))
    val start = recorded.getOrElse {
      prior.agg(coalesce(sum(col("batch_toks")), lit(0L)))
        .collect()(0).getLong(0)
    }
    val packed = ShardPacking.packGlobal(docs)
      .withColumn("cum_before", col("cum_before") + lit(start))
    val spans = packed
      .select(col("doc_id"), col("toks"), col("cum_before"),
        explode(sequence(
          expr(s"cum_before div $L"),
          expr(s"(cum_before + toks - 1) div $L"))).as("seq"))
      .select(col("doc_id"), col("seq"),
        (least(lit(L) * (col("seq") + 1), col("cum_before") + col("toks"))
          - greatest(lit(L) * col("seq"), col("cum_before"))).as("tok_in_seq"),
        col("cum_before"))
    spans.write.mode("overwrite")
      .parquet(s"${spansPath(stateDir)}/ingest_batch=$batchId")
    val batchToks = docs.agg(coalesce(sum(col("toks")), lit(0L)))
      .collect()(0).getLong(0)
    import s.implicits._
    prior.unionByName(
        Seq((batchId, start, batchToks))
          .toDF("batch_id", "start_offset", "batch_toks"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/offsets_next")
    // two-phase swap: the offsets read above must not reference the
    // files this write replaces mid-plan
    val fs = new Path(stateDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(offsetsPath(stateDir)), true)
    fs.rename(new Path(s"$stateDir/offsets_next"), new Path(offsetsPath(stateDir)))
  }

  /** Continuous wiring: a stream of (doc_id, toks) rows applied
    * micro-batch by micro-batch through [[processBatch]]. */
  def packingStream(docs: DataFrame, stateDir: String,
                    L: Long = 512L): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(batch, batchId, stateDir, L)
      }

  /** The accumulated per-sequence manifest (same shape as
    * `q_pack_sequences` minus full-doc accounting): one hash-agg over
    * the stored spans, never recomputing any batch. */
  def sequences(s: SparkSession, stateDir: String): DataFrame =
    s.read.parquet(spansPath(stateDir))
      .groupBy("seq")
      .agg(count(lit(1)).as("n_docs"), sum("tok_in_seq").as("toks"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("seq")
}
