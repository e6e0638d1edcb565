package graft.streaming

import graft.SparkSpec
import graft.operators.DedupResolve
import graft.sources.{DeleteAudit, GenerationedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for delete propagation (round-10 verdict item
  * 6): delete micro-batches through [[DeleteStreams]] must converge to
  * exactly the one-shot [[DeleteAudit.purgeNearDup]] of their union —
  * including a keeper-promotion batch and a bridge-split batch, in
  * either delivery order — every batch must leave a zero-survivors
  * certificate, and replaying an old batch must change nothing a
  * reader can see. */
class StreamingDeletePropagationSpec extends SparkSpec {
  import spark.implicits._

  private val root = "/tmp/graft_delstream"
  private val (pairD, keepD, certD) = (s"$root/pairs", s"$root/keep", s"$root/cert")

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  // chain 1-2-3-4 (3 is a bridge), triangle 10-11-12 (10 is the
  // keeper), detached pair 20-21
  private def seedPairs: DataFrame = Seq(
    (1L, 2L, 3L, 0.8), (2L, 3L, 3L, 0.7), (3L, 4L, 2L, 0.6),
    (10L, 11L, 4L, 0.9), (10L, 12L, 3L, 0.8), (11L, 12L, 3L, 0.7),
    (20L, 21L, 2L, 0.5))
    .toDF("doc_a", "doc_b", "nbands", "jaccard")

  private def pairSet(df: DataFrame) =
    df.select("doc_a", "doc_b", "nbands", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
  private def keepSet(df: DataFrame) =
    df.select("doc_id", "cluster", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  private def expectedFinal: (Set[(Long, Long, Long, Double)], Set[(Long, Long, Boolean)]) = {
    val pairs = seedPairs
    val keep = DedupResolve.keepList(pairs)
    val (p, k) = DeleteAudit.purgeNearDup(pairs, keep, Seq(3L, 10L).toDF("id"))
    (pairSet(p), keepSet(k))
  }

  test("streamed deletes converge to the one-shot purge, with certificates") {
    cleanup()
    val pairs = seedPairs
    DeleteStreams.seed(pairs, DedupResolve.keepList(pairs), pairD, keepD)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = DeleteStreams.deletePropagationStream(
      mem.toDF().toDF("doc_id"), pairD, keepD, certD,
      catalogSpace = None).start() // own-state parity; catalog tier below
    try {
      mem.addData(3L); q.processAllAvailable()   // bridge split
      mem.addData(10L); q.processAllAvailable()  // keeper promotion
    } finally q.stop()

    val (gotPairs, gotKeep) = DeleteStreams.currentState(spark, pairD, keepD)
    val (expP, expK) = expectedFinal
    assert(pairSet(gotPairs) == expP)
    assert(keepSet(gotKeep) == expK)
    // the semantics the two batches exercised, spelled out:
    val k = keepSet(gotKeep)
    assert(k.contains((11L, 11L, true)) && k.contains((12L, 11L, false)),
      "keeper promotion: 11 must lead the triangle after 10's deletion")
    assert(k.contains((1L, 1L, true)) && k.contains((2L, 1L, false)) &&
      !k.exists(_._1 == 4L),
      "bridge split: chain must shrink to {1,2}, singleton 4 drops out")
    // every batch left an all-zero survivors certificate
    val cert = spark.read.parquet(certD)
    assert(cert.select("batch").distinct().count() == 2)
    assert(cert.agg(sum("n_rows")).first().getLong(0) == 0,
      "a survivors certificate reported leftover references")

    // replay batch 0 (what a restarted stream re-applies): state the
    // reader sees is unchanged — pointer still serves the newest gen
    DeleteStreams.processBatch(Seq(3L).toDF("doc_id"), 0L, pairD, keepD,
      certD, catalogSpace = None)
    val (rp, rk) = DeleteStreams.currentState(spark, pairD, keepD)
    assert(pairSet(rp) == expP && keepSet(rk) == expK,
      "replayed delete batch changed served state")
    assert(GenerationedTable.latest(spark, pairD).contains(3),
      "replay regressed the generation pointer")
    assert(spark.read.parquet(certD).agg(sum("n_rows")).first().getLong(0) == 0)
    cleanup()
  }

  test("the per-batch certificate spans every manifest-declared catalog " +
    "relation and certifies zero after purge + rebuild") {
    cleanup()
    import graft.sources.IndexCatalog
    val base = s"$root/cat"
    IndexCatalog.rootOverride = Some(s"$base/catalog")
    IndexCatalog.resetProcessMemo()
    try {
      val deleted = Seq(3L, 10L)
      // the post-purge corpus: the deleted ids are already erased and
      // the artifact tier rebuilt over it (the batch-flow steps 1–3 the
      // DeleteAuditSpec drives; here they are the precondition)
      graft.Tables.documents(spark, sf0001)
        .filter(!col("doc_id").isin(deleted: _*))
        .write.mode("overwrite").parquet(s"$base/corpus/documents.parquet")
      graft.operators.DsirQueries.weightsTable(spark, s"$base/corpus").count()
      graft.operators.BoilerplateQueries.boilerplateDir(spark, s"$base/corpus")
      val declared = IndexCatalog.declaredIdRelations(spark, "doc")
        .map(_._1).toSet
      assert(declared.size >= 3, s"premise: weights + list + excised, got $declared")

      val pairs = seedPairs
      DeleteStreams.seed(pairs, DedupResolve.keepList(pairs), pairD, keepD)
      // tier-wide audit is an explicit EVENT (r13 advice item 3): a
      // one-shot audited batch with the catalog scope opted in
      DeleteStreams.processBatch(deleted.toDF("doc_id"), 0L, pairD, keepD,
        certD, catalogSpace = Some("doc"))
      val cert = spark.read.parquet(s"$certD/batch=0")
        .select("artifact", "n_rows").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      // every manifest-declared relation is certified, list from the
      // manifests — not a hand-picked literal
      for (rel <- declared)
        assert(cert.contains(rel), s"declared relation $rel missing from " +
          s"the certificate: ${cert.keys}")
      assert(cert.keySet.contains("pairs") && cert.keySet.contains("keep"),
        "the twin's own state must stay certified")
      assert(cert.values.forall(_ == 0L),
        s"a deleted id survives somewhere in the tier: $cert")
      // the standalone certification event (what production wiring runs
      // at purge/rebuild time, keeping the continuous stream
      // |delta|-proportional) certifies the same tier all-zero
      DeleteStreams.certifyCatalog(deleted.toDF("doc_id"), certD,
        label = "rebuild-event")
      val event = spark.read.parquet(s"$certD-events/label=rebuild-event")
        .select("artifact", "n_rows").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      for (rel <- declared)
        assert(event.contains(rel), s"event certificate missing $rel")
      assert(event.values.forall(_ == 0L), s"event certificate nonzero: $event")
    } finally {
      IndexCatalog.rootOverride = None
      IndexCatalog.resetProcessMemo()
      cleanup()
    }
  }

  test("permuted delivery order converges to the same final state") {
    cleanup()
    val pairs = seedPairs
    DeleteStreams.seed(pairs, DedupResolve.keepList(pairs), pairD, keepD)
    // out-of-order arrival: the keeper deletion lands BEFORE the bridge
    DeleteStreams.processBatch(Seq(10L).toDF("doc_id"), 0L, pairD, keepD,
      certD, catalogSpace = None)
    DeleteStreams.processBatch(Seq(3L).toDF("doc_id"), 1L, pairD, keepD,
      certD, catalogSpace = None)
    val (gotPairs, gotKeep) = DeleteStreams.currentState(spark, pairD, keepD)
    val (expP, expK) = expectedFinal
    assert(pairSet(gotPairs) == expP && keepSet(gotKeep) == expK,
      "delete batches did not commute")
    cleanup()
  }
}
