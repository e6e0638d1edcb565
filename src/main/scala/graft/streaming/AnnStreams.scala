package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.operators.SimilarityQueries
import graft.sources.UpsertBucketedSink

/** Streaming ANN serving — the online half of the train-once /
  * query-many lifecycle: a stream of query vectors is searched per
  * micro-batch against the PERSISTED IVF index
  * ([[graft.operators.IvfIndex]]), and results land in a bucketed
  * table keyed by (query_id, rank).
  *
  * Per-batch cost is |batch| × (one quantize pass + a broadcast of the
  * k·dim centroid frame + a cell-pruned candidate join) — the index is
  * never retrained and the corpus is never rescanned beyond the probed
  * cells. The write is an idempotent keyed merge, so micro-batch replay
  * after a restart converges to the same results table (same rule as
  * every other streaming sink here).
  *
  * Search is deterministic (integer-space quantizer, exact codegen
  * cosine, vec_id tie-break), so the streamed results for a query
  * vector are IDENTICAL to the batch `q_ann_ivf` answer for it —
  * StreamingAnnSpec pins that parity across batches and replays. */
object AnnStreams {

  /** One micro-batch application (exposed for replay tests): search the
    * batch of (query_id, embedding) rows, merge results into
    * `resultTable` (query_id, neighbor_id, rank, cosine, _gen).
    *
    * Batch hygiene (shared with [[RetrievalStreams]]): same-batch
    * duplicate query_ids collapse to one deterministic row (greatest
    * embedding hash), and the merge is versioned by the BATCH id AND
    * scope-owned by query_id — the batch replaces ALL of a re-streamed
    * query's previous rows, not just the (query_id, rank) keys it
    * happens to collide with. The distinction matters because ivfSearch
    * (nprobe=1) can return FEWER rows for a changed embedding (smaller
    * probed cell): without scope ownership the old generation's ranks
    * beyond the new count would keep serving — a mixed-generation
    * surface (round-12 advice item 1; StreamingAnnSpec pins the
    * smaller-cell case). Replay (same batchId) rewrites identical
    * rows — a no-op. */
  def processBatch(batch: DataFrame, batchId: Long, dir: String,
                   resultTable: String, k: Int = 5, buckets: Int = 8): Unit = {
    val one = batch
      .withColumn("_rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(xxhash64(col("embedding")).desc)))
      .filter(col("_rk") === 1)
      .drop("_rk")
    val out = SimilarityQueries.ivfSearch(batch.sparkSession, dir, one, k)
      .withColumn("_gen", lit(batchId))
    // scopes come from the INPUT queries, not the search output: a
    // re-streamed query probing an EMPTY cell returns zero result rows,
    // and output-derived scopes would let its entire old generation
    // keep serving (round-13 advice item 5; UpsertSinkSpec pins the
    // zero-result eviction at the sink boundary).
    val scopes = one.select(col("query_id")).withColumn("_gen", lit(batchId))
    UpsertBucketedSink(buckets, Seq("query_id", "rank"), "_gen",
        scopeCols = Seq("query_id"))
      .write(out, resultTable, Some(scopes))
  }

  /** Continuous wiring: a stream of (query_id, embedding) vectors
    * searched micro-batch by micro-batch through [[processBatch]]. */
  def searchStream(queries: DataFrame, dir: String, resultTable: String,
                   k: Int = 5, buckets: Int = 8): DataStreamWriter[Row] =
    queries.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, dir, resultTable, k, buckets)
      }
}
