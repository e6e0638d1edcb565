package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.sources.UpsertBucketedSink

/** Streaming entity resolution — the record-linkage twin of
  * [[DedupStreams.incrementalDedupStream]]: each micro-batch of NEW
  * customer records is blocked on its demographic key and fuzzy-matched
  * (levenshtein ≤ 2) against the ACCUMULATED block index, so a record
  * links to every earlier record it matches the moment it arrives —
  * the always-current Customer360 linkage a nightly batch can only
  * approximate. BOTH batch blocking passes stream: the demographic key
  * and the name-suffix key each contribute pass-tagged block rows
  * (`d|…` / `s|…` — tags keep the key spaces disjoint, so a cross-pass
  * key collision can never invent a candidate the batch run lacks), and
  * the match dedups on the pair exactly like the batch union. Batch
  * twin: `q_er_multiblock` (recall INCLUDING the suffix-pass matches).
  *
  * Per-batch cost is |delta| × matching block widths: the block key is
  * one scalar expression on the arriving row (nothing corpus-sized is
  * recomputed — unlike shingling, there is no signature to rebuild),
  * and the stored block index is read, not re-derived. State mirrors
  * the LSH stream:
  *
  *  - `custTable` (cust_id, name): records seen so far, a keyed
  *    merge ([[UpsertBucketedSink]]), one row per record;
  *  - `pairTable` (cust_a, cust_b, dist): matched pairs, keyed by the
  *    pair;
  *  - `blockDir`: the persisted block index (blk, cust_id, name),
  *    partitioned by ingest batch — each record enters it exactly
  *    once, on arrival.
  *
  * Replay safety: a re-applied micro-batch anti-joins its ids out of
  * the base slices, pair/record writes are keyed merges, and the block
  * write overwrites its own `ingest_batch=<id>` partition — restart
  * recovery changes no table (the [[DedupStreams]] contract).
  *
  * Unlike greedy corpus ingest there is no keep/drop decision here, so
  * stream and nightly batch agree EXACTLY (no greedy divergence class):
  * the accumulated pair set equals the batch run over the same records
  * regardless of arrival order — below the batch hot-block cap. The
  * batch passes sub-block oversized blocks
  * ([[graft.operators.ResolutionQueries.subBlocked]]); the stream pairs
  * within raw blocks (a sub-block id depends on the FINAL block size,
  * unknowable mid-stream), so an above-cap block keeps its early pairs
  * where a guarded batch rebuild would slice them — the linkage analog
  * of the documented greedy/nightly divergence, absent below the cap. */
object ResolutionStreams {

  /** Demographic block key — must match `q_er_fuzzy_match`'s. */
  private def blk(nat: org.apache.spark.sql.Column,
                  seg: org.apache.spark.sql.Column) = concat_ws("|", nat, seg)

  /** (blk, cust_id, name) block-index rows of a record slice: TWO
    * pass-tagged rows per record — the demographic key and the
    * name-suffix key of `q_er_multiblock`'s second pass. */
  private[streaming] def blockRowsOf(records: DataFrame): DataFrame = {
    val base = records.select(
      col("c_custkey").as("cust_id"), col("c_name").as("name"),
      blk(col("c_nationkey"), col("c_mktsegment")).as("dblk"))
    base.select(concat(lit("d|"), col("dblk")).as("blk"),
        col("cust_id"), col("name"))
      .unionByName(base.select(
        concat(lit("s|"), substring(col("name"), -3, 3)).as("blk"),
        col("cust_id"), col("name")))
  }

  /** Incremental match plan: delta block rows against (stored ∪ delta),
    * levenshtein ≤ 2, canonical (min, max) pair orientation. Pure plan
    * construction; a delta–delta pair arrives once from each side, so
    * dedup before emitting. */
  private[streaming] def incrementalMatchAgainst(
      deltaRows: DataFrame, baseRows: DataFrame): DataFrame = {
    val allRows = baseRows.unionByName(deltaRows)
    val d = deltaRows.select(col("blk"),
      col("cust_id").as("d_id"), col("name").as("d_name"))
    val o = allRows.select(col("blk"),
      col("cust_id").as("o_id"), col("name").as("o_name"))
    d.join(o, Seq("blk"))
      .filter(col("d_id") =!= col("o_id"))
      // banded early-exit DP, computed once; -1 marks over-threshold
      .withColumn("dist", levenshtein(col("d_name"), col("o_name"), 2))
      .filter(col("dist") >= 0)
      .select(
        least(col("d_id"), col("o_id")).as("cust_a"),
        greatest(col("d_id"), col("o_id")).as("cust_b"),
        // orientation-independent: distance is symmetric
        col("dist"))
      .distinct()
  }

  private def readBlocks(s: SparkSession, blockDir: String,
                         emptyLike: DataFrame,
                         excludeBatch: Option[Long] = None): DataFrame = {
    // data = non-metadata entries: the dir may hold only the
    // _INGEST_BLOOM ledger after a crash between the ledger write and
    // the first block write
    if (IngestContract.hasDataEntries(s, blockDir)) {
      val all = s.read.parquet(blockDir)
      excludeBatch.fold(all)(b => all.filter(col("ingest_batch") =!= b))
        .select("blk", "cust_id", "name")
    } else emptyLike.select("blk", "cust_id", "name").limit(0)
  }

  /** One micro-batch application, exposed apart from the stream wiring
    * so tests can replay a batch (same `batchId`) directly. Expects
    * customer-shaped rows (c_custkey, c_name, c_nationkey,
    * c_mktsegment). */
  def processBatch(batch: DataFrame, batchId: Long, custTable: String,
                   pairTable: String, blockDir: String,
                   buckets: Int = 8): Unit = {
    val s = batch.sparkSession
    val deltaRows = blockRowsOf(batch)
    val deltaIds = batch.select(col("c_custkey").as("cust_id"))
    // NEW-RECORDS CONTRACT, ENFORCED — see [[IngestContract]]: bloom
    // ledger for the common case, exact scan on any bloom hit.
    val stored = readBlocks(s, blockDir, deltaRows,
      excludeBatch = Some(batchId))
    IngestContract.checkAndRecord(stored, deltaIds, "cust_id", batchId,
      indexDir = blockDir, what = "cust ids",
      remedy = "record updates need a supersede-capable twin")
    // replay-safety: a re-applied batch's rows leave the base slice
    val baseRows = stored
      .join(deltaIds, Seq("cust_id"), "left_anti")
    val pairs = incrementalMatchAgainst(deltaRows, baseRows)
    UpsertBucketedSink(buckets, Seq("cust_a", "cust_b"), "dist")
      .write(pairs, pairTable)
    // each record enters the stored block index exactly once: the
    // partition is keyed by batchId, so a replay rewrites it in place
    deltaRows.write.mode("overwrite").parquet(s"$blockDir/ingest_batch=$batchId")
    // the RECORD table stays one row per record (the block index holds
    // two pass-tagged rows; merging those on cust_id would drop one)
    UpsertBucketedSink(buckets, Seq("cust_id"), "cust_id")
      .write(batch.select(col("c_custkey").as("cust_id"),
        col("c_name").as("name")), custTable)
  }

  /** Continuous wiring: a stream of customer records applied
    * micro-batch by micro-batch through [[processBatch]]. */
  def linkageStream(records: DataFrame, custTable: String,
                    pairTable: String, blockDir: String,
                    buckets: Int = 8): DataStreamWriter[Row] =
    records.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, custTable, pairTable, blockDir, buckets)
      }
}
