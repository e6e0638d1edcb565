package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import graft.operators.{BoilerplateQueries, DsirQueries}

/** Curation-on-arrival: the streaming twins of the two frozen-artifact
  * curation operators — DSIR importance scoring (`q_dsir_weights`) and
  * line-grain boilerplate excision (`q_line_excise`). Both follow the
  * [[QualityStreams]] frozen-model contract: the model is trained ONCE
  * on the reference corpus, persisted with a commit marker, and every
  * micro-batch is scored against that frozen state — the hot path never
  * retrains.
  *
  * Frozen-state caveats (both documented, both by design — the
  * [[graft.sources.DeleteAudit]] frozen-cap precedent):
  *  - DSIR: an arriving token in a bucket the trainer never populated
  *    prices at ct=0/cr=0 (left join + coalesce), i.e. exactly the
  *    smoothed prior — deterministic, never a drop;
  *  - boilerplate: a segment that only BECOMES boilerplate through new
  *    arrivals is not excised until the next retrain — the frozen list
  *    is the reference corpus's verdict, not a running count (a running
  *    count would make excision order-dependent and replay-unsafe).
  *
  * Replay safety: each micro-batch overwrites its own
  * `ingest_batch=<id>` partition; re-fetched doc_ids supersede via
  * newest-batch-wins in the readers. */
object CurationStreams {

  // ---------------------------------------------------------------- DSIR

  /** The frozen DSIR model: 256-row bucket counts + scalar totals + the
    * frozen selection cut (the training pool's 30th-highest weight). */
  final case class DsirModel(buckets: DataFrame, nt: Long, nr: Long, cut: Long)

  private def dsirMarker(dir: String) = new Path(s"$dir/_DSIR_MODEL_OK")

  /** Train and persist the frozen DSIR model from the corpus. The commit
    * marker is retracted FIRST and re-created LAST, so a crash
    * mid-retrain leaves an explicitly-uncommitted dir. */
  def trainDsir(s: SparkSession, corpusDir: String, modelDir: String): DsirModel = {
    val fs = dsirMarker(modelDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(dsirMarker(modelDir), false)
    val bk = DsirQueries.bucketTokens(graft.Tables.documents(s, corpusDir))
    val bt = DsirQueries.bucketModel(bk).cache()
    try {
      bt.write.mode("overwrite").parquet(s"$modelDir/buckets")
      val Row(nt: Long, nr: Long) =
        bt.agg(sum("ct").as("nt"), sum("cr").as("nr")).head()
      // the frozen selection boundary: the training pool's 30th-highest
      // doc weight (the q_dsir_sample admission line)
      val cut = bk.filter(!DsirQueries.isTarget)
        .join(broadcast(bt.crossJoin(broadcast(
          bt.agg(sum("ct").as("nt"), sum("cr").as("nr"))))), Seq("b"))
        .withColumn("s", DsirQueries.scoreCol)
        .groupBy("doc_id")
        .agg(sum(col("s").cast("long")).as("weight_bits"))
        .orderBy(col("weight_bits").desc, col("doc_id"))
        .limit(30)
        .agg(min("weight_bits")).head().getLong(0)
      s.range(1)
        .select(lit(nt).as("nt"), lit(nr).as("nr"), lit(cut).as("cut"))
        .write.mode("overwrite").parquet(s"$modelDir/totals")
      fs.create(dsirMarker(modelDir), true).close()
    } finally bt.unpersist()
    loadDsir(s, modelDir)
  }

  /** Re-open a persisted frozen DSIR model; refuses an uncommitted dir. */
  def loadDsir(s: SparkSession, modelDir: String): DsirModel = {
    val fs = dsirMarker(modelDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(dsirMarker(modelDir)),
      s"DSIR model at $modelDir lacks the _DSIR_MODEL_OK commit marker " +
        "(interrupted training) — re-run trainDsir()")
    val t = s.read.parquet(s"$modelDir/totals").head()
    DsirModel(s.read.parquet(s"$modelDir/buckets"),
      t.getAs[Long]("nt"), t.getAs[Long]("nr"), t.getAs[Long]("cut"))
  }

  /** One micro-batch DSIR scoring (exposed for replay tests). Every
    * arriving doc scores — a crawl carries no trusted target label, so
    * target-slice re-deliveries get a row too; `selected` is the frozen
    * admission verdict (boundary TIES are admitted, where the batch
    * top-30 would tie-break by doc_id — divergence confined to rows
    * whose weight equals the cut exactly). */
  def dsirScoreBatch(batch: DataFrame, batchId: Long, m: DsirModel,
                     outDir: String): Unit =
    dsirScoreFrame(QualityStreams.oneRowPerDoc(batch), m)
      .write.mode("overwrite").parquet(s"$outDir/ingest_batch=$batchId")

  /** Score one already-deduplicated (doc_id, source, text) frame under
    * the frozen model — the micro-batch core, shared with the composed
    * [[AdmissionStreams]] twin. */
  private[streaming] def dsirScoreFrame(one: DataFrame, m: DsirModel): DataFrame =
    DsirQueries.bucketTokens(one)
      .join(broadcast(m.buckets), Seq("b"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      .withColumn("nt", lit(m.nt))
      .withColumn("nr", lit(m.nr))
      .withColumn("s", DsirQueries.scoreCol)
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("s").cast("long")).as("weight_bits"))
      .withColumn("selected", col("weight_bits") >= m.cut)

  /** Continuous wiring: documents scored on arrival under the model
    * trained once on `corpusDir`. */
  def dsirStream(docs: DataFrame, corpusDir: String, modelDir: String,
                 outDir: String): DataStreamWriter[Row] = {
    val m = trainDsir(docs.sparkSession, corpusDir, modelDir)
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) dsirScoreBatch(batch, batchId, m, outDir)
      }
  }

  /** The accumulated scored pool, newest-batch-wins on re-ingest. */
  def dsirScored(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("ingest_batch").desc)))
      .filter(col("rk") === 1)
      .select("doc_id", "source", "n_tokens", "weight_bits", "selected")

  // --------------------------------------------------------- boilerplate

  private def bpMarker(dir: String) = new Path(s"$dir/_BP_LIST_OK")

  /** Train and persist the frozen boilerplate list (segments carried by
    * >= MinDocs distinct reference-corpus documents). */
  def trainBoilerplate(s: SparkSession, corpusDir: String, modelDir: String): DataFrame = {
    val fs = bpMarker(modelDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(bpMarker(modelDir), false)
    BoilerplateQueries
      .boilerplateOf(BoilerplateQueries.segmentsOf(
        graft.Tables.documents(s, corpusDir)))
      .write.mode("overwrite").parquet(s"$modelDir/bplist")
    fs.create(bpMarker(modelDir), true).close()
    loadBoilerplate(s, modelDir)
  }

  /** Re-open the persisted list; refuses an uncommitted dir. */
  def loadBoilerplate(s: SparkSession, modelDir: String): DataFrame = {
    val fs = bpMarker(modelDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(bpMarker(modelDir)),
      s"boilerplate list at $modelDir lacks the _BP_LIST_OK commit " +
        "marker (interrupted training) — re-run trainBoilerplate()")
    s.read.parquet(s"$modelDir/bplist")
  }

  /** One micro-batch excision against the frozen list. */
  def bpExciseBatch(batch: DataFrame, batchId: Long, bp: DataFrame,
                    outDir: String): Unit = {
    val one = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(length(col("text")).desc, col("text").desc)))
      .filter(col("_rk") === 1)
      .drop("_rk")
    BoilerplateQueries
      .exciseFrom(BoilerplateQueries.segmentsOf(one), bp)
      .write.mode("overwrite").parquet(s"$outDir/ingest_batch=$batchId")
  }

  /** Continuous wiring: excise-on-arrival under the list trained once
    * on `corpusDir`. */
  def boilerplateStream(docs: DataFrame, corpusDir: String, modelDir: String,
                        outDir: String): DataStreamWriter[Row] = {
    val bp = trainBoilerplate(docs.sparkSession, corpusDir, modelDir)
    docs.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) bpExciseBatch(batch, batchId, bp, outDir)
      }
  }

  /** The accumulated cleaned corpus, newest-batch-wins on re-ingest. */
  def bpExcised(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("ingest_batch").desc)))
      .filter(col("rk") === 1)
      .select("doc_id", "segs_total", "segs_removed", "words_total",
        "words_kept", "cleaned_fp")
}
