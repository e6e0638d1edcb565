package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.{DedupQueries, IvfIndex, SimilarityQueries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for semantic dedup: vectors arriving in
  * micro-batches through [[SemanticStreams.semanticDedupStream]] —
  * assigned to frozen trained cells, paired within cell against the
  * accumulated assignment index — must accumulate EXACTLY the
  * `q_dedup_semantic` pair set, including pairs between vectors that
  * arrived in different micro-batches, and replaying a micro-batch
  * (restart recovery) must change no table. */
class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val vecT = "ssd_vecs"
  private val pairT = "ssd_pairs"
  private val asnD = "/tmp/graft_ssd_asn"

  private def cleanup(): Unit = {
    Seq(vecT, pairT, s"${vecT}_upsert_staging", s"${pairT}_upsert_staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(asnD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def pairKey(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue, r.getDouble(3))

  test("micro-batched semantic dedup accumulates the batch pair set") {
    cleanup()
    import SimilarityQueries.{ivfIters, ivfK}
    // train-once: the same persisted IVF artifact q_dedup_semantic uses
    val centroids = IvfIndex.centroids(spark, sf0001, ivfK, ivfIters)
    val vecs = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")

    // expected: the full batch semantic pair set over the same corpus
    val expected = DedupQueries.semPairs(spark, sf0001)
      .select("vec_a", "vec_b", "cell", "cosine")
      .collect().map(pairKey).toSet
    assert(expected.nonEmpty, "sf0.001 should produce semantic pairs")

    // stream the WHOLE corpus from empty state in three micro-batches,
    // so cross-batch pairs exercise the stored-assignment growth
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = SemanticStreams.semanticDedupStream(
      mem.toDF().toDF("vec_id", "embedding"), centroids,
      vecT, pairT, asnD, buckets = 4).start()
    val all = vecs.as[(Long, Array[Float])].collect()
    val chunks = all.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2)
    try {
      chunks.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }

      val got = spark.table(pairT)
        .select("vec_a", "vec_b", "cell", "cosine")
        .collect().map(pairKey).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(spark.table(vecT).count() == vecs.count(),
        "vector table should hold every streamed vector exactly once")
      // the stored assignment index covers every vector exactly once
      val asn = spark.read.parquet(asnD)
      assert(asn.count() == vecs.count())
      assert(asn.select("vec_id").distinct().count() == vecs.count())
      // and assignments equal the persisted batch index (frozen centroids)
      val batchAsn = IvfIndex.assignments(spark, sf0001, ivfK, ivfIters)
        .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
      assert(asn.select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
        == batchAsn)

      // replay the last micro-batch with ITS batch id (what a restarted
      // stream re-applies): keyed merges and the per-batch assignment
      // partition are idempotent — nothing moves
      SemanticStreams.processBatch(
        chunks.last.toIndexedSeq.toDF("vec_id", "embedding"),
        batchId = chunks.size - 1L, centroids, vecT, pairT, asnD, buckets = 4)
      assert(spark.table(pairT).select("vec_a", "vec_b", "cell", "cosine")
        .collect().map(pairKey).toSet == expected,
        "replayed micro-batch changed the pair table")
      assert(spark.table(vecT).count() == vecs.count(),
        "replayed micro-batch changed the vector table")
      assert(spark.read.parquet(asnD).count() == vecs.count(),
        "replayed micro-batch changed the assignment index")
    } finally { q.stop(); cleanup() }
  }

  test("a seeded corpus pairs the delta against stored assignments only") {
    cleanup()
    import SimilarityQueries.{ivfIters, ivfK}
    val centroids = IvfIndex.centroids(spark, sf0001, ivfK, ivfIters)
    val vecs = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    try {
      SemanticStreams.seedVectors(
        spark, vecs.filter(col("vec_id") % 5 =!= 0), centroids, vecT, asnD,
        buckets = 4)
      SemanticStreams.processBatch(
        vecs.filter(col("vec_id") % 5 === 0), batchId = 0L, centroids,
        vecT, pairT, asnD, buckets = 4)
      // delta-touching slice of the batch pair set
      val expected = DedupQueries.semPairs(spark, sf0001)
        .filter(col("vec_a") % 5 === 0 || col("vec_b") % 5 === 0)
        .select("vec_a", "vec_b", "cell", "cosine")
        .collect().map(pairKey).toSet
      val got = spark.table(pairT)
        .select("vec_a", "vec_b", "cell", "cosine")
        .collect().map(pairKey).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(spark.table(vecT).count() == vecs.count())
    } finally cleanup()
  }

  test("cross-batch re-ingest of a known vector fails the new-records " +
    "contract loudly") {
    cleanup()
    import SimilarityQueries.{ivfIters, ivfK}
    val centroids = IvfIndex.centroids(spark, sf0001, ivfK, ivfIters)
    val vecs = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    try {
      SemanticStreams.seedVectors(
        spark, vecs.filter(col("vec_id") < 20), centroids, vecT, asnD,
        buckets = 4)
      // a re-embedded vector would leave stale pairs serving and a
      // stale cell assignment — the twin must refuse (r13 verdict
      // item 7); re-embedding is the retrain lifecycle's job
      val e = intercept[IllegalArgumentException] {
        SemanticStreams.processBatch(
          vecs.filter(col("vec_id") === 5), batchId = 0L, centroids,
          vecT, pairT, asnD, buckets = 4)
      }
      assert(e.getMessage.contains("re-ingests"), e.getMessage)
    } finally cleanup()
  }
}
