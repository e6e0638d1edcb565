package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.WinnowQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for winnowing: documents arriving in
  * out-of-order micro-batches through [[WinnowStreams.winnowMatchStream]]
  * must accumulate EXACTLY the `q_winnow_matches` pair set — including
  * pairs whose two documents arrived in different micro-batches —
  * because fingerprint selection is stateless per document and a pair's
  * shared count is final when its later member arrives. Replaying a
  * micro-batch (restart recovery) must change no table. The sf0.001
  * corpus sits below the bucket cap, so the documented at-arrival cap
  * divergence is not in play — parity is exact. */
class StreamingWinnowSpec extends SparkSpec {
  import spark.implicits._

  private val pairT = "sw_pairs"
  private val fpD = "/tmp/graft_sw_fp"

  private def cleanup(): Unit = {
    Seq(pairT, s"${pairT}_upsert_staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(fpD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def pairKey(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2))

  test("micro-batched winnowing accumulates the batch match set; replay is a no-op") {
    cleanup()
    val expected = WinnowQueries.matches.run(spark, sf0001)
      .collect().map(pairKey).toSet
    assert(expected.nonEmpty, "the replica-heavy corpus should match")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = WinnowStreams.winnowMatchStream(
      mem.toDF().toDF("doc_id", "text"), pairT, fpD, buckets = 4).start()
    val all = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    // out-of-order thirds: near-dup partners land in different batches
    val chunks = all.groupBy(_._1 % 3).toSeq.sortBy(-_._1).map(_._2)
    try {
      chunks.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }

      val got = spark.table(pairT).select("doc_a", "doc_b", "n_shared")
        .collect().map(pairKey).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      // the stored index holds every doc's full stateless fingerprint set
      val fpStream = spark.read.parquet(fpD).select("doc_id", "fh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fpBatch = WinnowQueries.fingerprintHashes(
        Tables.documents(spark, sf0001))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fpStream == fpBatch, "streamed fingerprints must be bit-identical")

      // replay the last micro-batch with ITS batch id
      val before = (spark.table(pairT).collect().map(pairKey).toSet,
        spark.read.parquet(fpD).count())
      WinnowStreams.processBatch(
        chunks.last.toIndexedSeq.toDF("doc_id", "text"),
        batchId = chunks.size - 1L, pairT, fpD, buckets = 4)
      val after = (spark.table(pairT).collect().map(pairKey).toSet,
        spark.read.parquet(fpD).count())
      assert(after == before, "replaying a batch must be a no-op")
    } finally {
      q.stop()
      cleanup()
    }
  }
}
