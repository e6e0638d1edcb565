package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.operators.{DedupQueries, IvfQuantizer}
import graft.plans.CosineSimilarity.cosineSim
import graft.sources.UpsertBucketedSink

/** Streaming semantic dedup — the IVF-cell twin of
  * [[DedupStreams.incrementalDedupStream]] (round-5 verdict missing
  * item 3): each micro-batch of NEW embedding vectors is assigned to
  * its trained coarse cell (frozen centroids, map-only) and paired
  * against the ACCUMULATED assignment table within cells, with
  * per-batch cost Σ |deltaᵢ|·min(cellᵢ, cap) — never |corpus|². The
  * batch twin is `q_dedup_semantic`; StreamingSemanticDedupSpec pins
  * the parity, cross-batch pairs included.
  *
  * State lives in three stores, mirroring the LSH stream:
  *
  *  - `vecTable` (vec_id, embedding): vectors seen so far, a keyed
  *    merge ([[UpsertBucketedSink]]) — the verify step fetches only
  *    candidate vectors from it;
  *  - `pairTable` (vec_a, vec_b, cell, cosine): verified pairs, keyed
  *    by (vec_a, vec_b);
  *  - `asnDir`: the PERSISTED ASSIGNMENT INDEX (vec_id, cell),
  *    partitioned by ingest batch — each vector is quantized once, on
  *    arrival, and later batches join against stored assignments
  *    instead of re-quantizing the corpus (the band-index discipline,
  *    cell-shaped).
  *
  * Centroids are TRAINED ONCE (the persisted [[graft.operators.IvfIndex]]
  * artifact this module deliberately does not retrain) and passed in
  * frozen — the production SemDeDup lifecycle: nightly train, stream
  * assign. The cell cap is evaluated over the FULL accumulated index
  * each batch, exactly like the batch plan over the same vectors; as
  * with the greedy corpus-ingest stream, a cell that outgrows the cap
  * MID-STREAM keeps pairs discovered while it was small (keyed merges
  * never delete), where a nightly rebuild would drop the whole cell —
  * the documented greedy/nightly divergence, absent below the cap.
  *
  * Replay safety: a re-applied micro-batch anti-joins its vec ids out
  * of the base slices (so the replayed plan equals the original), the
  * pair/vector writes are keyed merges, and the assignment write
  * overwrites its own `ingest_batch=<id>` partition. No step depends
  * on the Spark streaming checkpoint for correctness. */
object SemanticStreams {

  /** The incremental pair plan over stored state: delta assignments
    * against (stored ∪ delta), capped cells, exact codegen cosine at
    * 0.45 over candidate-fetched vectors only. Pure plan construction. */
  private[streaming] def incrementalPairsAgainst(
      deltaAsn: DataFrame, baseAsn: DataFrame, vectors: DataFrame): DataFrame = {
    val allAsn = baseAsn.select("vec_id", "cell")
      .unionByName(deltaAsn.select("vec_id", "cell"))
    // same cap as the batch generator, over the FULL accumulated index
    val okCells = allAsn.groupBy("cell")
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") <= DedupQueries.SemanticMaxCell)
      .select("cell")
    val bounded = allAsn.join(okCells, Seq("cell"))
    val dSide = bounded.join(deltaAsn.select("vec_id"), Seq("vec_id"))
      .select(col("vec_id").as("d_id"), col("cell"))
    val aSide = bounded.select(col("vec_id").as("o_id"), col("cell"))
    // (cell, vec_id)-only candidate join — vectors never travel through
    // it; a delta-delta pair arrives once from each side, so dedup
    // before the (wider) verify join
    val cand = dSide.join(aSide, Seq("cell"))
      .filter(col("d_id") =!= col("o_id"))
      .select(least(col("d_id"), col("o_id")).as("vec_a"),
              greatest(col("d_id"), col("o_id")).as("vec_b"), col("cell"))
      .distinct()
    val va = vectors.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val vb = vectors.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    cand
      .join(va, Seq("vec_a"))
      .join(vb, Seq("vec_b"))
      .withColumn("cosine", cosineSim(col("ea"), col("eb")))
      .filter(col("cosine") >= 0.45)
      .select("vec_a", "vec_b", "cell", "cosine")
  }

  private def readAsn(s: SparkSession, asnDir: String,
                      emptyLike: DataFrame,
                      excludeBatch: Option[Long] = None): DataFrame = {
    // data = non-metadata entries: the generation dir may hold only the
    // _GEN_BOUNDARY_DONE marker (or the _INGEST_BLOOM ledger) before
    // any slice lands
    if (IngestContract.hasDataEntries(s, asnDir)) {
      val all = s.read.parquet(asnDir)
      excludeBatch.fold(all)(b => all.filter(col("ingest_batch") =!= b))
        .select("vec_id", "cell")
    } else emptyLike.select("vec_id", "cell").limit(0)
  }

  /** One micro-batch application, exposed apart from the stream wiring
    * so tests can replay a batch (same `batchId`) directly. */
  def processBatch(batch: DataFrame, batchId: Long, centroids: DataFrame,
                   vecTable: String, pairTable: String, asnDir: String,
                   buckets: Int = 8): Unit = {
    val s = batch.sparkSession
    val delta = batch.select("vec_id", "embedding")
    val deltaIds = delta.select("vec_id")
    val deltaAsn = IvfQuantizer.assignVectors(delta, centroids)
    // NEW-RECORDS CONTRACT, ENFORCED — see [[IngestContract]]: bloom
    // ledger for the common case, exact scan on any bloom hit.
    val storedAsn = readAsn(s, asnDir, deltaAsn, excludeBatch = Some(batchId))
    IngestContract.checkAndRecord(storedAsn, deltaIds, "vec_id", batchId,
      indexDir = asnDir, what = "vec ids",
      remedy = "re-embedding goes through the retrain lifecycle's " +
        "generation swap")
    // replay-safety: a re-applied batch's rows leave the base slices
    val baseVecs =
      if (s.catalog.tableExists(vecTable))
        s.table(vecTable).select("vec_id", "embedding")
          .join(deltaIds, Seq("vec_id"), "left_anti")
      else delta.limit(0)
    val baseAsn = storedAsn
      .join(deltaIds, Seq("vec_id"), "left_anti")
    val pairs = incrementalPairsAgainst(
      deltaAsn, baseAsn, baseVecs.unionByName(delta))
    UpsertBucketedSink(buckets, Seq("vec_a", "vec_b"), "cosine")
      .write(pairs, pairTable)
    // each vector's assignment enters the stored index exactly once:
    // the partition is keyed by batchId, so a replay rewrites in place
    deltaAsn.write.mode("overwrite").parquet(s"$asnDir/ingest_batch=$batchId")
    UpsertBucketedSink(buckets, Seq("vec_id"), "vec_id")
      .write(delta, vecTable)
  }

  /** Continuous wiring: a stream of (vec_id, embedding) vectors applied
    * micro-batch by micro-batch through [[processBatch]]. */
  def semanticDedupStream(vecs: DataFrame, centroids: DataFrame,
                          vecTable: String, pairTable: String,
                          asnDir: String, buckets: Int = 8): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, centroids, vecTable, pairTable,
            asnDir, buckets)
      }

  /** Seed the vector table AND the assignment index with an existing
    * corpus (the batch state the stream extends). */
  def seedVectors(s: SparkSession, vecs: DataFrame, centroids: DataFrame,
                  vecTable: String, asnDir: String, buckets: Int = 8): Unit = {
    // ledger-bypassing index write below: drop the ledger FIRST (the
    // DedupStreams seedCorpus rule — absent is always safe, stale is
    // not; dropping before the write keeps "ledger ⊇ index" through a
    // crash mid-seed). The generationed boundary seed needs no drop —
    // its generation dir is fresh, no ledger can exist there yet.
    IngestContract.invalidateLedger(s, asnDir)
    UpsertBucketedSink(buckets, Seq("vec_id"), "vec_id")
      .write(vecs.select("vec_id", "embedding"), vecTable)
    IvfQuantizer.assignVectors(vecs.select("vec_id", "embedding"), centroids)
      .write.mode("overwrite").parquet(s"$asnDir/ingest_batch=-1")
  }

  // ---------------------------------------------------------------------
  // Generation-aware wiring: the retrain-lifecycle consumer
  // ---------------------------------------------------------------------

  /** The per-generation slice of the assignment index: assignments made
    * under centroid generation `gen` live under `gen=<g>/`, so a retrain
    * never touches the slice a pinned reader resolved — the
    * [[graft.sources.GenerationedTable]] isolation contract, applied to
    * the streaming state. */
  def asnGenDir(asnDir: String, gen: Int): String = s"$asnDir/gen=$gen"

  /** One micro-batch under the retrain lifecycle ([[graft.operators.IvfLifecycle]]):
    * resolve the CURRENT centroid generation from the store's pointer,
    * and on the first batch after a retrain — the generation boundary —
    * REASSIGN the accumulated vector table under the new centroids
    * before processing, so every later batch pairs against a
    * consistent, current-generation cell space. Cost of the boundary:
    * one map-only quantize pass over stored vectors + broadcast join
    * (assignment shape, no training), paid once per generation.
    *
    * Pair semantics across the boundary: `pairTable` is a keyed merge
    * and keeps pairs discovered under earlier generations — the same
    * greedy-vs-nightly divergence contract as the cap (a nightly batch
    * rebuild under the new generation would regenerate pairs from the
    * reassigned index only). Assignment reads are always
    * generation-consistent: [[processBatch]] reads only this
    * generation's `gen=<g>/` slice.
    *
    * Replay safety: the boundary reassignment is keyed by a
    * `_GEN_BOUNDARY_DONE` marker written only AFTER the seed-slice
    * overwrite completes (the parquet write creates the generation dir
    * before it finishes, so bare dir existence would let a crash
    * mid-write masquerade as done and silently serve an index missing
    * part of the accumulated corpus). A replayed boundary batch with no
    * marker reruns the overwrite — idempotent — and the reassignment
    * excludes the incoming batch's ids, so it reproduces the original
    * plan exactly. */
  def processBatchGenerationed(batch: DataFrame, batchId: Long,
                               store: String, vecTable: String,
                               pairTable: String, asnDir: String,
                               buckets: Int = 8): Unit = {
    import graft.operators.IvfLifecycle
    import graft.sources.GenerationedTable
    val s = batch.sparkSession
    val gen = GenerationedTable.latest(s, IvfLifecycle.centroidsDir(store))
      .getOrElse(throw new IllegalStateException(
        s"$store has no trained centroid generation — run IvfLifecycle.retrain first"))
    val centroids =
      GenerationedTable.read(s, IvfLifecycle.centroidsDir(store), Some(gen))
    val genDir = asnGenDir(asnDir, gen)
    val p = new Path(genDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // Completion marker, not dir existence: the overwrite below creates
    // genDir before it finishes. The marker also records the "nothing to
    // seed" boundary (no accumulated corpus yet) so a LATER batch — by
    // which time vecTable exists and holds rows already assigned via
    // their own ingest_batch slices — never runs a duplicating seed pass.
    val marker = new Path(p, "_GEN_BOUNDARY_DONE")
    if (!fs.exists(marker)) {
      if (s.catalog.tableExists(vecTable)) {
        // generation boundary: the accumulated corpus re-enters the new
        // cell space once, as the seed slice of the new generation's index
        IvfQuantizer.assignVectors(
            s.table(vecTable).select("vec_id", "embedding")
              .join(batch.select("vec_id"), Seq("vec_id"), "left_anti"),
            centroids)
          .write.mode("overwrite").parquet(s"$genDir/ingest_batch=-1")
      }
      fs.mkdirs(p)
      fs.create(marker, true).close()
    }
    processBatch(batch, batchId, centroids, vecTable, pairTable, genDir, buckets)
  }

  /** Continuous generation-aware wiring: like [[semanticDedupStream]],
    * but each micro-batch resolves the centroid store's `_LATEST`
    * pointer, so the stream switches to a freshly retrained generation
    * at the next batch boundary — no restart, no coordination beyond
    * the pointer. */
  def semanticDedupStreamGenerationed(
      vecs: DataFrame, store: String, vecTable: String, pairTable: String,
      asnDir: String, buckets: Int = 8): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatchGenerationed(batch, batchId, store, vecTable,
            pairTable, asnDir, buckets)
      }
}
