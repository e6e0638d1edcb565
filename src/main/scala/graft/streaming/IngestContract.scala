package graft.streaming

import org.apache.spark.sql.DataFrame

/** Shared enforcement of the incremental twins' NEW-RECORDS contract
  * (round-13 verdict item 7): [[DedupStreams]], [[SemanticStreams]]
  * and [[ResolutionStreams]] have no supersede machinery, so a record
  * re-ingested in a LATER batch with changed content would leave its
  * old pairs serving and its old index rows polluting future batches
  * (the mixed-generation class). They refuse such a batch loudly;
  * re-ingest-capable pipelines go through [[WinnowStreams]] (documents,
  * newest-wins + pair retraction) or the retrain lifecycle
  * (embeddings, generation swap). */
private[streaming] object IngestContract {

  /** Fail loudly when any id in `deltaIds` already exists in `stored`
    * — the accumulated index EXCLUDING the current batch's own
    * partition, so a same-batch replay is exempt by construction.
    *
    * Cost honesty: these twins already read the FULL stored index once
    * per batch (candidate buckets and caps are computed over the whole
    * index), so their per-batch model is "O(stored-index) scans +
    * |delta|-bounded joins"; this check adds a second such scan (the
    * broadcast delta-id semi-join prunes its output, not the read),
    * not a new complexity class. At larger state a bloom filter of
    * ingested ids replaces the semi-join. */
  def requireNewRecords(stored: DataFrame, deltaIds: DataFrame,
                        idCol: String, batchId: Long, what: String,
                        remedy: String): Unit = {
    val clash = stored.join(deltaIds, Seq(idCol), "left_semi")
      .select(idCol).distinct().take(5)
    require(clash.isEmpty,
      s"batch $batchId re-ingests $what already in the stored index " +
        s"(${clash.map(_.get(0)).mkString(", ")}, ...) — this twin's " +
        s"contract is new-records-only; $remedy")
  }
}
