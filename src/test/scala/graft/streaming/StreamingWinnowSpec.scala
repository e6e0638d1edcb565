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
    Seq(pairT, s"${pairT}_upsert_staging", s"${pairT}_purge_staging")
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
      // the bounded top-k VIEW over the accumulated pair state equals
      // the batch top-k serving surface exactly after full ingest
      val topkGot = WinnowStreams.topkView(spark, pairT).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val topkWant = WinnowQueries.matchesTopK.run(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(topkGot == topkWant,
        s"stream top-k view diverges: missing=${(topkWant -- topkGot).take(3)} " +
          s"extra=${(topkGot -- topkWant).take(3)}")

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

  // a run of ≥ 7 shared words is certainly detected (w + k - 1 = 7);
  // these share ~30 words, far above MatchMin shared fingerprints
  private def run(tag: String) =
    (1 to 30).map(i => s"$tag$i").mkString(" ")
  private def doc(tag: String, salt: String) =
    s"$salt opening words here ${run(tag)} closing trailer $salt"

  test("cross-batch re-ingest supersedes fingerprints and retracts stale pairs") {
    cleanup()
    try {
      // batch 0: A(1) and B(2) share run alpha → pair (1,2); D(4) alone
      WinnowStreams.processBatch(Seq(
          (1L, doc("alpha", "sa")), (2L, doc("alpha", "sb")),
          (4L, doc("delta", "sd"))).toDF("doc_id", "text"),
        batchId = 0L, pairT, fpD, buckets = 4)
      val p0 = spark.table(pairT).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p0 == Set((1L, 2L)), s"expected the alpha pair, got $p0")

      // batch 1: A re-fetched with NEW text sharing delta with D —
      // the alpha pair must retract, the (1,4) pair must appear
      WinnowStreams.processBatch(
        Seq((1L, doc("delta", "sa2"))).toDF("doc_id", "text"),
        batchId = 1L, pairT, fpD, buckets = 4)
      val p1 = spark.table(pairT).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p1 == Set((1L, 4L)),
        s"stale alpha pair must retract, new delta pair must land: $p1")

      // the served index counts ONLY A's newest fingerprints: matching
      // state equals a from-scratch batch over the newest texts
      val finalCorpus = Seq(
        (1L, doc("delta", "sa2")), (2L, doc("alpha", "sb")),
        (4L, doc("delta", "sd"))).toDF("doc_id", "text")
      val fpAll = WinnowQueries.fingerprintHashes(finalCorpus)
      val expected = WinnowStreams.incrementalMatchAgainst(
          fpAll, fpAll.limit(0))
        .select("doc_a", "doc_b", "n_shared").collect().map(pairKey).toSet
      val got = spark.table(pairT).select("doc_a", "doc_b", "n_shared")
        .collect().map(pairKey).toSet
      assert(got == expected, s"stream state must equal newest-text batch: " +
        s"missing=${expected -- got} extra=${got -- expected}")

      // replaying the re-ingest batch is still a no-op
      WinnowStreams.processBatch(
        Seq((1L, doc("delta", "sa2"))).toDF("doc_id", "text"),
        batchId = 1L, pairT, fpD, buckets = 4)
      val replay = spark.table(pairT).select("doc_a", "doc_b", "n_shared")
        .collect().map(pairKey).toSet
      assert(replay == got, "replaying the re-ingest batch must be a no-op")
    } finally cleanup()
  }

  test("index compaction: newest-only single partition, matching and " +
    "replay unaffected") {
    cleanup()
    try {
      WinnowStreams.processBatch(Seq(
          (1L, doc("alpha", "sa")), (2L, doc("alpha", "sb"))).toDF("doc_id", "text"),
        batchId = 0L, pairT, fpD, buckets = 4)
      WinnowStreams.processBatch(
        Seq((1L, doc("delta", "sa2")), (4L, doc("delta", "sd")))
          .toDF("doc_id", "text"),
        batchId = 1L, pairT, fpD, buckets = 4)
      import org.apache.spark.sql.functions.{col, max}
      val servedBefore = spark.read.parquet(fpD)
        .withColumn("nb", max("ingest_batch")
          .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
        .filter(col("ingest_batch") === col("nb"))
        .select("doc_id", "fh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pairsBefore = spark.table(pairT).collect().map(pairKey).toSet

      WinnowStreams.compactIndex(spark, fpD)
      // one partition, newest rows only (doc 1's alpha set is GONE)
      val parts = new org.apache.hadoop.fs.Path(fpD)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(new org.apache.hadoop.fs.Path(fpD))
        .map(_.getPath.getName).filter(_.startsWith("ingest_batch="))
      assert(parts.toSeq == Seq("ingest_batch=1"), parts.mkString(","))
      val after = spark.read.parquet(fpD).select("doc_id", "fh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == servedBefore, "compaction changed the served rows")

      // matching continues identically: a new batch matching doc 4's
      // delta run pairs with BOTH delta carriers, never old alpha
      WinnowStreams.processBatch(
        Seq((7L, doc("delta", "sg"))).toDF("doc_id", "text"),
        batchId = 2L, pairT, fpD, buckets = 4)
      val pairsNow = spark.table(pairT).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairsNow == Set((1L, 4L), (1L, 7L), (4L, 7L)),
        s"post-compaction matching wrong: $pairsNow")

      // recovery replay (the LATEST batch, the structured-streaming
      // model) after compaction is still a no-op
      val beforeReplay = spark.table(pairT).collect().map(pairKey).toSet
      WinnowStreams.processBatch(
        Seq((7L, doc("delta", "sg"))).toDF("doc_id", "text"),
        batchId = 2L, pairT, fpD, buckets = 4)
      assert(spark.table(pairT).collect().map(pairKey).toSet == beforeReplay,
        "replaying the latest batch after compaction must be a no-op")
      assert(pairsBefore.subsetOf(beforeReplay),
        "pre-compaction pairs must survive compaction")

      // INTERRUPTED compaction at the worst point: staging + marker
      // written, every partition already deleted, crash before the
      // rename. Readers must refuse loudly; a rerun must complete the
      // swap to exactly the pre-interruption served rows.
      val servedNow = spark.read.parquet(fpD).select("doc_id", "fh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fs = new org.apache.hadoop.fs.Path(fpD)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      spark.read.parquet(fpD).select("doc_id", "fh")
        .write.mode("overwrite").parquet(s"$fpD/_compact_staging")
      val mk = fs.create(
        new org.apache.hadoop.fs.Path(fpD, "_COMPACT_COMMIT"), true)
      try mk.write("2".getBytes("UTF-8")) finally mk.close()
      fs.listStatus(new org.apache.hadoop.fs.Path(fpD)).foreach { st =>
        if (st.getPath.getName.startsWith("ingest_batch="))
          fs.delete(st.getPath, true)
      }
      val refused = intercept[IllegalArgumentException] {
        WinnowStreams.processBatch(
          Seq((9L, doc("omega", "so"))).toDF("doc_id", "text"),
          batchId = 3L, pairT, fpD, buckets = 4)
      }
      assert(refused.getMessage.contains("interrupted compaction"),
        s"mid-compaction reads must refuse loudly: ${refused.getMessage}")
      WinnowStreams.compactIndex(spark, fpD) // resume completes the swap
      val servedAfter = spark.read.parquet(fpD).select("doc_id", "fh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(servedAfter == servedNow,
        "resumed compaction must restore the exact served rows")
    } finally cleanup()
  }

  test("a batch at or below the compaction watermark is refused loudly") {
    cleanup()
    try {
      WinnowStreams.processBatch(Seq(
          (1L, doc("alpha", "sa")), (2L, doc("alpha", "sb")))
          .toDF("doc_id", "text"),
        batchId = 0L, pairT, fpD, buckets = 4)
      WinnowStreams.processBatch(
        Seq((4L, doc("delta", "sd"))).toDF("doc_id", "text"),
        batchId = 1L, pairT, fpD, buckets = 4)
      WinnowStreams.compactIndex(spark, fpD) // watermark = 1
      val fpBefore = spark.read.parquet(fpD).count()
      // the round-12 advice scenario: a batch id <= the compacted
      // partition id replayed against a live/compacted index would
      // overwrite the single partition holding the ENTIRE corpus's
      // newest fingerprints with one batch's rows
      for (bad <- Seq(0L, 1L)) {
        val e = intercept[IllegalArgumentException] {
          WinnowStreams.processBatch(
            Seq((9L, doc("omega", "so"))).toDF("doc_id", "text"),
            batchId = bad, pairT, fpD, buckets = 4)
        }
        assert(e.getMessage.contains("compaction watermark"),
          s"batch $bad must hit the watermark guard: ${e.getMessage}")
      }
      assert(spark.read.parquet(fpD).count() == fpBefore,
        "a refused batch must leave the index untouched")
      // batches above the watermark proceed normally
      WinnowStreams.processBatch(
        Seq((9L, doc("omega", "so"))).toDF("doc_id", "text"),
        batchId = 2L, pairT, fpD, buckets = 4)
      assert(spark.read.parquet(fpD).count() > fpBefore)
      // a leftover atomic-write temp file never wedges a recompaction
      val fs = new org.apache.hadoop.fs.Path(fpD)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(fpD, "_COMPACT_COMMIT.tmp")
      val out = fs.create(tmp, true)
      try out.write("gar".getBytes("UTF-8")) finally out.close()
      WinnowStreams.compactIndex(spark, fpD) // watermark = 2, no wedge
      assert(WinnowStreams.compactedThrough(spark, fpD).contains(2L))
    } finally cleanup()
  }

  test("a purge interrupted between DROP and RENAME is recovered, not " +
    "fresh-created over") {
    cleanup()
    try {
      // accumulate real pair state
      WinnowStreams.processBatch(Seq(
          (1L, doc("alpha", "sa")), (2L, doc("alpha", "sb")),
          (4L, doc("delta", "sd")), (5L, doc("delta", "se")))
          .toDF("doc_id", "text"),
        batchId = 0L, pairT, fpD, buckets = 4)
      val pairs = spark.table(pairT).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L), (4L, 5L)),
        s"premise: two disjoint pairs, got $pairs")
      // simulate the crash window: full state staged, table dropped,
      // rename never ran (round-12 advice item 3)
      graft.sources.BucketedTableSink(4, Seq("doc_a", "doc_b"))
        .write(spark.table(pairT), s"${pairT}_purge_staging")
      spark.sql(s"DROP TABLE $pairT")
      // the NEXT batch is a plain first-time ingest — without recovery
      // the sink would fresh-create the pair table from this batch
      // alone, silently discarding both accumulated pairs
      WinnowStreams.processBatch(
        Seq((7L, doc("omega", "sg"))).toDF("doc_id", "text"),
        batchId = 1L, pairT, fpD, buckets = 4)
      val after = spark.table(pairT).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == Set((1L, 2L), (4L, 5L)),
        s"accumulated pairs lost across the purge crash window: $after")
      assert(!spark.catalog.tableExists(s"${pairT}_purge_staging"),
        "the adopted staging table must not linger")
    } finally cleanup()
  }

  test("same-batch duplicate doc_ids collapse to one deterministic row") {
    cleanup()
    try {
      val keptText = doc("beta", "longsalt extra padding words making this strictly longer")
      WinnowStreams.processBatch(Seq(
          (7L, doc("gamma", "short")), (7L, keptText)).toDF("doc_id", "text"),
        batchId = 0L, pairT, fpD, buckets = 4)
      val stored = spark.read.parquet(fpD).select("doc_id", "fh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = WinnowQueries.fingerprintHashes(
          Seq((7L, keptText)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stored == expect,
        "the longest text's fingerprint set alone must be stored — " +
          "never a union of two texts no batch run could produce")
    } finally cleanup()
  }
}
