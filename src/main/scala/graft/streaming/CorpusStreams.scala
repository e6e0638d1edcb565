package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.functions.TextFunctions._
import graft.operators.DedupResolve
import graft.sources.UpsertBucketedSink

/** Streaming corpus ingest — the continuous twin of
  * [[graft.pipeline.CorpusPipeline]]: each micro-batch of crawled
  * documents passes the SAME gates the nightly build applies (quality →
  * benchmark decontamination → near-dup dedup) and the survivors merge
  * into a growing curated-corpus table. What a crawl-fed training-data
  * service runs between nightly rebuilds.
  *
  * Per-batch cost is |batch| × (map gates) + |batch| × bucket-width:
  * the dedup gate pairs the batch against [[DedupStreams]]' PERSISTED
  * band index (each kept document is shingled/minhashed exactly once,
  * on arrival; later batches join the stored band rows) — never a
  * corpus-wide re-shingle, never corpus².
  *
  * DEDUP SEMANTICS (documented delta vs the nightly build): ONLINE
  * GREEDY. A batch doc is dropped if it near-dups an already-KEPT doc
  * (cross pair), or if it is not the minimum of its within-batch dup
  * component. The nightly build instead drops everything but the global
  * component minimum; the two agree except where a dup chain spans
  * batches through a DROPPED middle doc (a–b cross-batch, b–c
  * cross-batch, a̸–c: greedy keeps c, nightly drops it) — the standard
  * online/offline dedup divergence, pinned by the parity spec's
  * simulation. Ids are assumed to arrive roughly in order (a crawl's
  * shape), keeping greedy and nightly choices aligned on plain pairs.
  *
  * Replay safety: a re-applied micro-batch first anti-joins its doc ids
  * out of the base corpus and band-index slices, so the replayed plan
  * equals the original; the corpus write is an idempotent keyed merge
  * and the band write overwrites its own per-batch partition. */
object CorpusStreams {

  /** One micro-batch application (exposed for replay tests): gate the
    * batch, dedup it against the accumulated corpus via the stored band
    * index under `bandDir`, merge survivors into `corpusTable`
    * (doc_id, source, text) and their band rows into the index.
    * `benchGrams` is the fixed benchmark-gram frame (one column `g`),
    * typically [[graft.operators.CorpusQueries.benchGrams]]'s persisted
    * artifact. */
  def processBatch(batch: DataFrame, batchId: Long, corpusTable: String,
                   benchGrams: DataFrame, bandDir: String,
                   buckets: Int = 8): Unit = {
    val s = batch.sparkSession
    val docs = batch.select("doc_id", "source", "text")
    val batchIds = docs.select("doc_id")
    // NEW-RECORDS CONTRACT over the KEPT index ([[IngestContract]]):
    // a re-crawled doc that was previously KEPT would leave ghost band
    // rows and a stale corpus text — refuse it loudly. A previously
    // DROPPED (or gated-out) id is NOT in the stored index, so its
    // re-fetch legitimately re-enters the gates — exactly the greedy
    // semantics (its blocking keeper may have been purged since). The
    // ledger absorbs ALL batch ids (superset — dropped ids re-fetched
    // later just take the exact-scan path); same-batch replay exempt
    // via own-partition exclusion.
    val storedBands = DedupStreams.readBands(
      s, bandDir, docs.select("doc_id", "text"),
      excludeBatch = Some(batchId))
    IngestContract.checkAndRecord(storedBands, batchIds, "doc_id", batchId,
      indexDir = bandDir, what = "previously KEPT doc ids",
      remedy = "re-crawls of kept documents go through the nightly " +
        "rebuild (or the winnow twin's supersede path)")
    // replay-safety: a re-applied batch's rows leave the base slices,
    // so the replayed plan equals the original application
    val kept0 =
      if (s.catalog.tableExists(corpusTable))
        s.table(corpusTable).join(batchIds, Seq("doc_id"), "left_anti")
      else docs.limit(0)

    // gate 1: quality (integer cross-multiplied ratio — the nightly rule)
    val toks = size(tokens(col("text")))
    val dtoks = size(array_distinct(tokens(col("text"))))
    val quality = docs.filter(toks >= 20 && dtoks * 10 >= toks * 3)

    // gate 2: benchmark decontamination against the FIXED gram artifact
    // (benchmark members themselves — doc_id % 97 = 0, the nightly
    // convention — never enter the training corpus)
    val grams = quality.select(col("doc_id"),
      explode(array_distinct(wordShingles(tokens(col("text")), 5))).as("g"))
    val contaminated = grams.join(benchGrams, "g").select("doc_id").distinct()
    val cand = quality
      .filter(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")

    // gate 3: online-greedy near-dup dedup — the batch's texts against
    // the STORED band index (kept docs were shingled when they arrived;
    // only candidate texts shingle now)
    val baseBands = storedBands
      .join(batchIds, Seq("doc_id"), "left_anti")
    val pairs = DedupStreams.incrementalPairsAgainst(
        cand.select("doc_id", "text"),
        kept0.select("doc_id", "text"),
        baseBands)
      .select("doc_a", "doc_b")
    val candIds = cand.select("doc_id")
    val p = pairs
      .join(candIds.select(col("doc_id").as("doc_a"), lit(true).as("da")),
        Seq("doc_a"), "left")
      .join(candIds.select(col("doc_id").as("doc_b"), lit(true).as("db")),
        Seq("doc_b"), "left")
    // exactly one side in the batch: the batch side dups a kept doc
    val crossDrop = p.filter(col("da").isNotNull =!= col("db").isNotNull)
      .select(when(col("da").isNotNull, col("doc_a")).otherwise(col("doc_b"))
        .as("doc_id"))
      .distinct()
    // both sides in the batch: keep each component's minimum
    val within = p.filter(col("da").isNotNull && col("db").isNotNull)
      .select("doc_a", "doc_b")
    val withinDrop = DedupResolve.keepList(within)
      .filter(!col("keep")).select("doc_id")
    val keepNew = cand
      .join(crossDrop, Seq("doc_id"), "left_anti")
      .join(withinDrop, Seq("doc_id"), "left_anti")

    // only KEPT docs' bands enter the stored index — a dropped doc
    // never blocks a future one (greedy semantics) — and the partition
    // is keyed by batchId, so a replay rewrites it in place. Written
    // BEFORE the corpus merge: keepNew's plan reads the pre-swap corpus
    // table, and the upsert's staging swap retires those files.
    DedupStreams.bandRowsOf(keepNew.select("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$bandDir/ingest_batch=$batchId")
    UpsertBucketedSink(buckets, Seq("doc_id"), "doc_id")
      .write(keepNew.select("doc_id", "source", "text"), corpusTable)
  }

  /** Continuous wiring: a stream of (doc_id, source, text) documents
    * applied micro-batch by micro-batch through [[processBatch]]. */
  def ingestStream(docs: DataFrame, corpusTable: String,
                   benchGrams: DataFrame, bandDir: String,
                   buckets: Int = 8): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, corpusTable, benchGrams, bandDir, buckets)
      }
}
