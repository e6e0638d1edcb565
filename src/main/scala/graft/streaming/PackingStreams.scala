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
    * the right schema when nothing has been ingested yet.
    *
    * Crash-safe read order (the swap in [[processBatch]] can die at any
    * point): canonical `offsets` first; if it is missing, `offsets_next`
    * (a crash between the canonical rename-aside and the rename-in
    * leaves the NEWEST committed state there); then `offsets_prev` (the
    * renamed-aside previous state — unreachable under the swap protocol
    * unless `offsets_next` was externally removed, kept as belt and
    * braces). A directory counts only with its commit marker (our own
    * `_GRAFT_COMMIT`, written after the parquet job; legacy `_SUCCESS`
    * accepted), so a half-written `offsets_next` can never shadow real
    * state — and the canonical dir is only ever deleted AFTER
    * `offsets_next` is fully written. Without this fallback a crash inside the swap would
    * restart every later batch at offset 0, silently corrupting the
    * global token stream. */
  private[streaming] def readOffsets(s: SparkSession, stateDir: String): DataFrame = {
    val fs = new Path(stateDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val candidates = Seq(offsetsPath(stateDir), s"$stateDir/offsets_next",
      s"$stateDir/offsets_prev")
    // committed = our OWN marker (written after the parquet job, so it
    // is committer-independent — a deployment that disables Spark's
    // _SUCCESS markers must not read as "no state, restart at 0"), with
    // _SUCCESS accepted for state written before the marker existed
    def committed(p: String) =
      fs.exists(new Path(p, "_GRAFT_COMMIT")) || fs.exists(new Path(p, "_SUCCESS"))
    candidates.find(committed) match {
      case Some(p) =>
        // renames bypass the cache invalidation a write performs —
        // drop any cached plan still referencing this dir's old files
        s.catalog.refreshByPath(p)
        s.read.parquet(p)
      case None =>
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
    // SNAPSHOT the offsets state to the driver before anything writes:
    // the table is batches-count-sized by construction (one row per
    // batch), and a lazy frame over it would race the offsets_next
    // overwrite below whenever the crash-recovery fallback is serving
    // reads from that very directory
    val all = readOffsets(s, stateDir)
      .select("batch_id", "start_offset", "batch_toks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val prior = all.filter(_._1 != batchId)
    // a replayed batch reuses ITS recorded start; a new batch starts at
    // the stored tail (sum over prior batches)
    val start = all.find(_._1 == batchId).map(_._2)
      .getOrElse(prior.map(_._3).sum)
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
    (prior.toSeq :+ ((batchId, start, batchToks)))
      .toDF("batch_id", "start_offset", "batch_toks")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/offsets_next")
    // our own commit marker, after the write job completes — the
    // half-written-dir gate must not depend on the committer's
    // _SUCCESS setting
    val fsm = new Path(stateDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    fsm.create(new Path(s"$stateDir/offsets_next/_GRAFT_COMMIT"), true).close()
    // Crash-safe swap (never a window with NO committed state on disk):
    // the canonical dir is renamed ASIDE, not deleted, before the new
    // state renames in — a crash between the two renames leaves
    // offsets_next (the newest committed state) for readOffsets'
    // fallback, and a crash anywhere earlier leaves the canonical dir
    // untouched. (The driver-side snapshot above means no live plan
    // references the files these renames move.)
    val fs = new Path(stateDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val offs = new Path(offsetsPath(stateDir))
    val next = new Path(s"$stateDir/offsets_next")
    val prev = new Path(s"$stateDir/offsets_prev")
    // FileSystem.rename reports failure by RETURNING FALSE (round-10
    // advice) — an unchecked false here would let the second rename
    // land on an existing destination (RawLocalFileSystem then NESTS
    // the source inside it) or leave the canonical dir stale while
    // offsets_next holds the newer committed state, and readOffsets
    // would prefer the stale dir: silent token-stream corruption. A
    // throw instead surfaces the failed swap and the batch replays.
    def renameOrThrow(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new IllegalStateException(
          s"offsets swap rename $src -> $dst failed; " +
            "state left recoverable (offsets_next is committed), batch must replay")
    fs.delete(prev, true)
    if (fs.exists(offs)) renameOrThrow(offs, prev)
    renameOrThrow(next, offs)
    fs.delete(prev, true)
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
