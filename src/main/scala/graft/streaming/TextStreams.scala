package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.functions.TextFunctions._

/** Streaming inverted-index maintenance — the text tier's continuous
  * twin (LSH dedup, semantic dedup, ANN serving and corpus ingest each
  * have one; search should too): every micro-batch of documents is
  * tokenized ONCE, on arrival, into positional postings
  * (term, doc_id, tf, positions) written as that batch's own
  * `ingest_batch=<id>` partition. Per-batch cost is O(|batch|) with no
  * reference to prior state at all — the index is a pure function of
  * each batch — so a replayed batch rewrites its partition into exactly
  * the same bytes (idempotent with no read-side coordination, stronger
  * than the keyed-merge tiers need).
  *
  * Readers dedup superseded documents at query time: a re-crawled doc
  * re-posts in a later partition, and [[termPostings]] keeps each
  * doc's postings from its NEWEST ingest batch only (a per-doc window
  * over the TERM-FILTERED slice, so query cost is bounded by the
  * looked-up terms' postings, not the index). Exact term lookup and
  * phrase adjacency then compose unchanged from the batch tier
  * ([[graft.operators.TextQueries.phraseHitsFrom]]). A periodic
  * rewrite folding partitions (the [[graft.sources.LogTable]]
  * compaction discipline) bounds partition fan-in; the parity spec
  * drives the whole loop. */
object TextStreams {

  /** Positional postings of one document frame — same shape as the
    * batch artifact's postings table. */
  private[streaming] def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .select("term", "doc_id", "tf", "positions")

  /** One micro-batch application: tokenize and write this batch's
    * postings partition. Pure per-batch work. */
  def processBatch(batch: DataFrame, batchId: Long, postDir: String): Unit =
    postingsOf(batch.select("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$postDir/ingest_batch=$batchId")

  /** Continuous wiring: a stream of (doc_id, text) documents. */
  def indexStream(docs: DataFrame, postDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(batch, batchId, postDir)
      }

  /** Query-time postings for a term set: term-filter first (bounded by
    * the looked-up postings), then keep each doc's newest ingest batch
    * — a re-crawled document's old postings are superseded WHOLESALE.
    * The newest-batch map must come from the FULL index, not the term
    * slice: when a re-crawl DROPS a term, the slice holds only the old
    * row, and a slice-local max would resurrect it. The full-index agg
    * touches two pruned columns (doc_id, partition value) — a fraction
    * of the postings bytes; a deployment would maintain it as a tiny
    * doc→batch side table. Pass `terms = Nil` for the full deduped
    * index (parity checks). */
  def termPostings(s: SparkSession, postDir: String,
                   terms: Seq[String]): DataFrame = {
    val all = s.read.parquet(postDir)
    val slice = if (terms.isEmpty) all else all.filter(col("term").isin(terms: _*))
    val latest = all.select("doc_id", "ingest_batch")
      .groupBy("doc_id").agg(max(col("ingest_batch")).as("_mb"))
    slice.join(latest, Seq("doc_id"))
      .filter(col("ingest_batch") === col("_mb"))
      .select("term", "doc_id", "tf", "positions")
  }

  /** Fold every postings partition EXCEPT the newest into the
    * second-newest, then drop the superseded olds — the maintenance
    * pass that bounds partition fan-in on a long-running stream (the
    * LogTable compaction discipline). The newest partition is
    * deliberately left alone: foreachBatch is at-least-once, so the
    * LAST batch may be replayed after a restart and would rightfully
    * OVERWRITE its partition — folding history into it would hand that
    * replay the whole index to destroy. Older batches are committed in
    * the streaming checkpoint and are never replayed (checkpoint loss
    * means reprocess-the-world, outside this contract). Safe for
    * readers because their contract is doc-max-batch dedup: the folded
    * rows carry the fold partition's id, which is ≥ every folded batch
    * and < the untouched newest batch. The swap briefly removes the
    * fold partition (delete + rename) — run from the ingest's own
    * driver between batches, the single-maintainer contract every swap
    * in this repo carries. Returns the fold partition id. */
  def compactIndex(s: SparkSession, postDir: String): Option[Long] = {
    val p = new Path(postDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val parts = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("ingest_batch="))
      .map(_.getPath.getName.stripPrefix("ingest_batch=").toLong)
      .sorted
    if (parts.size <= 2) return None
    val foldable = parts.init // all but the replay-eligible newest
    val foldId = foldable.last
    // materialize the deduped view of the foldable slice FIRST (it
    // reads those partitions), into a staging dir, then swap it in
    val staging = new Path(postDir + "_compact_staging")
    fs.delete(staging, true)
    val all = s.read.parquet(postDir)
      .filter(col("ingest_batch") <= foldId)
    val latest = all.select("doc_id", "ingest_batch")
      .groupBy("doc_id").agg(max(col("ingest_batch")).as("_mb"))
    all.join(latest, Seq("doc_id"))
      .filter(col("ingest_batch") === col("_mb"))
      .select("term", "doc_id", "tf", "positions")
      .write.mode("overwrite").parquet(staging.toString)
    val target = new Path(p, s"ingest_batch=$foldId")
    fs.delete(target, true)
    require(fs.rename(staging, target), s"cannot swap compacted index into $target")
    foldable.init.foreach(b => fs.delete(new Path(p, s"ingest_batch=$b"), true))
    Some(foldId)
  }

  /** BM25 over the STREAMED index — identical integer scoring to the
    * batch `q_text_bm25` (k1 = 6/5, b = 3/4, every fraction cleared by
    * 10·total_tokens), with no state beyond the postings partitions:
    * a document's length is Σtf over its deduped postings and the
    * collection constants fold from the lengths, so search follows a
    * continuously-ingested corpus with zero extra maintenance. (A
    * deployment would cache the doc-length/stats fold per batch epoch
    * rather than re-derive per query — same rows either way.) */
  def bm25(s: SparkSession, postDir: String, terms: Seq[String],
           k: Int = 20): DataFrame = {
    val post = termPostings(s, postDir, terms)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    val dl = termPostings(s, postDir, Nil)
      .groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val st = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).cast("long").as("total_tokens"))
    post.join(dl, Seq("doc_id"))
      .crossJoin(broadcast(st))
      .withColumn("idf",
        expr("(((n_docs - df) * 2 + 1) * 1000) div (2 * df + 1)"))
      .withColumn("tscore",
        expr("(idf * (22 * tf * total_tokens)) div " +
          "(10 * tf * total_tokens + 3 * total_tokens + 9 * dl * n_docs)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("tscore")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
