package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.ResolutionQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for entity resolution: customer records arriving
  * in micro-batches through [[ResolutionStreams.linkageStream]] must
  * accumulate EXACTLY the `q_er_fuzzy_match` pair set — including pairs
  * whose two records arrived in different micro-batches — and replaying
  * a micro-batch (restart recovery) must change no table. There is no
  * keep/drop decision in linkage, so parity is exact by construction,
  * not merely below a divergence class. */
class StreamingLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val custT = "sl_cust"
  private val pairT = "sl_pairs"
  private val blkD = "/tmp/graft_sl_blocks"

  private def cleanup(): Unit = {
    Seq(custT, pairT, s"${custT}_upsert_staging", s"${pairT}_upsert_staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(blkD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def pairKey(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)

  test("micro-batched linkage accumulates the batch match-pair set") {
    cleanup()
    val cust = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

    val expected = ResolutionQueries.matchPairs(spark, sf0001, None)
      .collect().map(pairKey).toSet
    assert(expected.nonEmpty, "sf0.001 should produce fuzzy matches")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Int, String)]
    val q = ResolutionStreams.linkageStream(
      mem.toDF().toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
      custT, pairT, blkD, buckets = 4).start()
    val all = cust.as[(Long, String, Int, String)].collect()
    val chunks = all.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2)
    try {
      chunks.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }

      val got = spark.table(pairT).select("cust_a", "cust_b", "dist")
        .collect().map(pairKey).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(spark.table(custT).count() == all.length,
        "record table should hold every streamed record exactly once")
      // the stored block index covers every record exactly once
      val blocks = spark.read.parquet(blkD)
      assert(blocks.count() == all.length)
      assert(blocks.select("cust_id").distinct().count() == all.length)

      // replay the last micro-batch with ITS batch id (what a restarted
      // stream re-applies): keyed merges and the per-batch block
      // partition are idempotent — nothing moves
      val before = (spark.table(pairT).collect().map(pairKey).toSet,
        spark.table(custT).count(), spark.read.parquet(blkD).count())
      ResolutionStreams.processBatch(
        chunks.last.toIndexedSeq
          .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        batchId = chunks.size - 1L, custT, pairT, blkD, buckets = 4)
      val after = (spark.table(pairT).collect().map(pairKey).toSet,
        spark.table(custT).count(), spark.read.parquet(blkD).count())
      assert(after == before, "replaying a batch must be a no-op")
    } finally {
      q.stop()
      cleanup()
    }
  }
}
