package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.functions.TextFunctions._
import graft.operators.DedupQueries
import graft.sources.UpsertBucketedSink

/** Streaming incremental near-dup detection — the daily/continuous-crawl
  * shape: each micro-batch of NEW documents pairs against the
  * accumulated corpus through the incremental LSH plan, with per-batch
  * cost |delta| × bucket width, never |corpus|². The batch twin is
  * `q_dedup_incremental`; StreamingIncrementalDedupSpec pins the parity.
  *
  * State lives in three stores:
  *
  *  - `corpusTable` (doc_id, text): the documents seen so far, a keyed
  *    merge ([[UpsertBucketedSink]]);
  *  - `pairTable` (doc_a, doc_b, nbands, jaccard): every verified pair
  *    discovered so far, keyed by (doc_a, doc_b);
  *  - `bandDir`: the PERSISTED BAND INDEX (doc_id, band, key rows,
  *    partitioned by ingest batch) — signatures are computed once, when
  *    a document arrives, and every later batch joins against the
  *    stored rows instead of re-shingling the corpus. Each batch writes
  *    its own `ingest_batch=<id>` partition with overwrite, so a
  *    replayed micro-batch rewrites the same partition — idempotent by
  *    construction, no append duplication.
  *
  * The verify step is semi-join pruned: candidate doc ids fetch their
  * texts first, and shingle sets are computed ONLY for those rows — at
  * scale a candidate-bounded text fetch, not a corpus re-shingle.
  *
  * Replay safety: a re-applied micro-batch anti-joins its doc ids out
  * of the corpus and band-index slices (so the replayed plan equals the
  * original), the pair/corpus writes are keyed merges, and the band
  * write overwrites its own partition. No step depends on the Spark
  * streaming checkpoint for correctness. */
object DedupStreams {

  private[streaming] def bandRowsOf(docs: DataFrame): DataFrame =
    DedupQueries.lshBandRows(DedupQueries.shinglesOf(docs))

  /** The incremental pair plan over stored state: delta docs against
    * (stored band index ∪ delta bands), bucket-capped, then exact
    * Jaccard verified over candidate-pruned texts only. Pure plan
    * construction — nothing executes here. */
  private[streaming] def incrementalPairsAgainst(
      delta: DataFrame, corpusText: DataFrame,
      baseBands: DataFrame): DataFrame = {
    val deltaBands = bandRowsOf(delta)
    val allBands = baseBands.select("doc_id", "band", "key")
      .unionByName(deltaBands)
    // same cap as the batch generator, over the FULL index
    val okBuckets = allBands.groupBy("band", "key")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= DedupQueries.LshMaxBucket)
      .select("band", "key")
    val bounded = allBands.join(okBuckets, Seq("band", "key"))
    val dSide = bounded.join(delta.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id").as("d_id"), col("band"), col("key"))
    val aSide = bounded
      .select(col("doc_id").as("o_id"), col("band"), col("key"))
    val cand = dSide.join(aSide, Seq("band", "key"))
      .filter(col("d_id") =!= col("o_id"))
      .select(least(col("d_id"), col("o_id")).as("doc_a"),
              greatest(col("d_id"), col("o_id")).as("doc_b"), col("band"))
      .groupBy("doc_a", "doc_b").agg(countDistinct(col("band")).as("nbands"))
      .filter(col("nbands") >= 2)
    // verify: fetch ONLY the candidate docs' texts, then shingle them —
    // the semi-join-pruned shape (no corpus-wide shingle recompute)
    val texts = corpusText.unionByName(delta)
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id")))
      .distinct()
    val candSh = texts.join(candIds, Seq("doc_id"))
      .select(col("doc_id"),
        array_distinct(wordShingles(tokens(col("text")), 3)).as("ss"))
    val sa = candSh.select(col("doc_id").as("doc_a"), col("ss").as("sa"))
    val sb = candSh.select(col("doc_id").as("doc_b"), col("ss").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    val jac = inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter)
    cand
      .join(sa, Seq("doc_a"))
      .join(sb, Seq("doc_b"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "nbands", "jaccard")
  }

  /** Stored band rows. `excludeBatch` prunes that ingest partition at
    * PLAN time — a replayed batch must neither see its own prior rows
    * (the original application didn't) nor hold read references to the
    * very files its band rewrite is about to replace. */
  private[streaming] def readBands(s: SparkSession, bandDir: String,
                                   emptyLike: DataFrame,
                                   excludeBatch: Option[Long] = None): DataFrame = {
    // data = non-metadata entries: the dir may hold only the
    // _INGEST_BLOOM ledger after a crash between the ledger write and
    // the first band write
    if (IngestContract.hasDataEntries(s, bandDir)) {
      val all = s.read.parquet(bandDir)
      excludeBatch.fold(all)(b => all.filter(col("ingest_batch") =!= b))
        .select("doc_id", "band", "key")
    } else bandRowsOf(emptyLike.limit(0))
  }

  /** One micro-batch application, exposed apart from the stream wiring
    * so tests can replay a batch (same `batchId`) directly. */
  def processBatch(batch: DataFrame, batchId: Long, corpusTable: String,
                   pairTable: String, bandDir: String,
                   buckets: Int = 8): Unit = {
    val s = batch.sparkSession
    val delta = batch.select("doc_id", "text")
    val deltaIds = delta.select("doc_id")
    // NEW-RECORDS CONTRACT, ENFORCED — see [[IngestContract]]: common
    // fresh-ingest batches pay |delta| bloom tests against the persisted
    // id ledger; bloom hits (real re-ingest, replay, saturation) fall
    // back to the exact stored-index scan.
    val stored = readBands(s, bandDir, delta, excludeBatch = Some(batchId))
    IngestContract.checkAndRecord(stored, deltaIds, "doc_id", batchId,
      indexDir = bandDir, what = "doc ids",
      remedy = "use the winnow twin's supersede path for re-ingest pipelines")
    // replay-safety: a re-applied batch's rows leave the base slices
    val base =
      if (s.catalog.tableExists(corpusTable))
        s.table(corpusTable).select("doc_id", "text")
          .join(deltaIds, Seq("doc_id"), "left_anti")
      else delta.limit(0)
    val baseBands = stored
      .join(deltaIds, Seq("doc_id"), "left_anti")
    val pairs = incrementalPairsAgainst(delta, base, baseBands)
    UpsertBucketedSink(buckets, Seq("doc_a", "doc_b"), "nbands")
      .write(pairs, pairTable)
    // the batch's signatures enter the stored index exactly once: the
    // partition is keyed by batchId, so a replay rewrites it in place
    bandRowsOf(delta)
      .write.mode("overwrite").parquet(s"$bandDir/ingest_batch=$batchId")
    UpsertBucketedSink(buckets, Seq("doc_id"), "doc_id")
      .write(delta, corpusTable)
  }

  /** Continuous wiring: a stream of (doc_id, text) documents applied
    * micro-batch by micro-batch through [[processBatch]]. */
  def incrementalDedupStream(docs: DataFrame, corpusTable: String,
                             pairTable: String, bandDir: String,
                             buckets: Int = 8): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, corpusTable, pairTable, bandDir, buckets)
      }

  /** Seed the corpus table AND the band index with an existing document
    * frame (the batch corpus the stream extends). */
  def seedCorpus(s: SparkSession, docs: DataFrame, corpusTable: String,
                 bandDir: String, buckets: Int = 8): Unit = {
    // the band write below bypasses checkAndRecord, so a ledger missing
    // the seeded ids would wave their re-ingest through — drop it FIRST
    // (absent ⇒ next batch exact-scans and rebuilds over the seed
    // slice). Dropping before the write keeps the "ledger ids ⊇ index
    // ids" invariant through a crash anywhere in the seed: an absent
    // ledger is always safe, a stale one is not.
    IngestContract.invalidateLedger(s, bandDir)
    UpsertBucketedSink(buckets, Seq("doc_id"), "doc_id")
      .write(docs.select("doc_id", "text"), corpusTable)
    bandRowsOf(docs.select("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$bandDir/ingest_batch=-1")
  }
}
