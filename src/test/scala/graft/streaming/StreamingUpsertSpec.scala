package graft.streaming

import graft.SparkSpec
import graft.sources.UpsertBucketedSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for the keyed merge: a stream of versioned rows
  * applied micro-batch by micro-batch through upsertStream must land on
  * the same table as one batch keep-latest recompute — and replaying a
  * batch (restart recovery) must change nothing. */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def cleanup(): Unit = {
    spark.sql("DROP TABLE IF EXISTS stream_upsert_t")
    spark.sql("DROP TABLE IF EXISTS stream_upsert_t_upsert_staging")
  }

  test("micro-batched upserts equal the batch keep-latest over all data") {
    cleanup()
    val sink = UpsertBucketedSink(4, Seq("k"), "ver")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val q = EventStreams
      .upsertStream(mem.toDF().toDF("k", "ver", "v"), sink, "stream_upsert_t")
      .start()
    try {
      mem.addData((1L, 10L, "a"), (2L, 10L, "b"))
      q.processAllAvailable()
      mem.addData((2L, 20L, "b2"), (3L, 15L, "c"))
      q.processAllAvailable()
      mem.addData((1L, 5L, "stale"), (3L, 30L, "c2"), (4L, 1L, "d"))
      q.processAllAvailable()
      val got = spark.table("stream_upsert_t").orderBy("k")
        .as[(Long, Long, String)].collect().toSeq
      assert(got == Seq((1L, 10L, "a"), (2L, 20L, "b2"),
                        (3L, 30L, "c2"), (4L, 1L, "d")))
      // replay the last payload (what a restarted stream re-applies):
      // the merge is idempotent, the table must not move
      mem.addData((1L, 5L, "stale"), (3L, 30L, "c2"), (4L, 1L, "d"))
      q.processAllAvailable()
      val replayed = spark.table("stream_upsert_t").orderBy("k")
        .as[(Long, Long, String)].collect().toSeq
      assert(replayed == got, "replayed micro-batch changed the table")
    } finally { q.stop(); cleanup() }
  }

  test("the streamed table keeps its bucket spec across micro-batches") {
    cleanup()
    val sink = UpsertBucketedSink(4, Seq("k"), "ver")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val q = EventStreams
      .upsertStream(mem.toDF().toDF("k", "ver", "v"), sink, "stream_upsert_t")
      .start()
    try {
      mem.addData((1L, 1L, "a")); q.processAllAvailable()
      mem.addData((2L, 1L, "b")); q.processAllAvailable()
      val ddl = spark.sql("SHOW CREATE TABLE stream_upsert_t")
        .collect()(0).getString(0)
      assert(ddl.contains("CLUSTERED BY") && ddl.contains("4 BUCKETS"),
        s"bucket spec lost after streamed merges:\n$ddl")
    } finally { q.stop(); cleanup() }
  }
}
