package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.SimilarityQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ANN serving parity: query vectors streamed through
  * [[AnnStreams.searchStream]] must accumulate EXACTLY the batch
  * `q_ann_ivf` results for those queries (deterministic index +
  * deterministic ranking), and replaying a micro-batch must change
  * nothing. */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private val resultT = "ann_stream_results"

  private def cleanup(): Unit =
    Seq(resultT, s"${resultT}_upsert_staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))

  test("streamed searches accumulate the batch IVF answers exactly") {
    cleanup()
    val expected = SimilarityQueries.ivfTopK.run(spark, sf0001)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .collect().map(key).toSet
    assert(expected.size == 50, "premise: 10 queries x top-5")

    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val (batch1, batch2) = queries.partition(_._1 < 5)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = AnnStreams.searchStream(
      mem.toDF().toDF("query_id", "embedding"), sf0001, resultT, buckets = 4)
      .start()
    try {
      mem.addData(batch1.toIndexedSeq); q.processAllAvailable()
      mem.addData(batch2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table(resultT).collect().map(key).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")

      // replay the second batch (its own batch id): the keyed merge
      // must not move
      AnnStreams.processBatch(
        batch2.toIndexedSeq.toDF("query_id", "embedding"), 1L, sf0001,
        resultT, buckets = 4)
      assert(spark.table(resultT).collect().map(key).toSet == expected,
        "replayed micro-batch changed the results table")
    } finally { q.stop(); cleanup() }
  }

  test("re-streamed query landing in a smaller cell supersedes wholesale") {
    cleanup()
    // nprobe=1 means a changed embedding can probe a SMALLER cell and
    // return fewer ranks; the old generation's ranks beyond the new
    // count must NOT keep serving (round-12 advice item 1)
    val asn = graft.operators.IvfIndex.assignments(
      spark, sf0001, SimilarityQueries.ivfK, SimilarityQueries.ivfIters)
    val sizes = asn.groupBy("cell").count()
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1)))
      .sortBy(_._2)
    val (smallCell, smallN) = sizes.head
    val (bigCell, bigN) = sizes.last
    assert(bigN > smallN, "premise: cells of different sizes")
    val k = smallN.toInt + 1 // big serves k rows, small only smallN
    def memberEmb(cell: Long): Array[Float] = {
      val vid = asn.filter(col("cell") === cell).agg(min("vec_id"))
        .first().getLong(0)
      Tables.embeddings(spark, sf0001).filter(col("vec_id") === vid)
        .select("embedding").as[Array[Float]].first()
    }
    try {
      AnnStreams.processBatch(
        Seq((9999L, memberEmb(bigCell))).toDF("query_id", "embedding"),
        0L, sf0001, resultT, k = k, buckets = 4)
      assert(spark.table(resultT).count() == k,
        s"premise: big-cell search serves k=$k rows")
      AnnStreams.processBatch(
        Seq((9999L, memberEmb(smallCell))).toDF("query_id", "embedding"),
        1L, sf0001, resultT, k = k, buckets = 4)
      val served = spark.table(resultT)
        .select("rank", "_gen").collect()
      assert(served.length == smallN,
        s"mixed-generation surface: ${served.length} rows served, " +
          s"want $smallN (old ranks beyond the new count must die)")
      assert(served.forall(_.getLong(1) == 1L),
        "a row from the superseded generation survived")
      assert(served.map(_.getInt(0)).sorted.toSeq == (1 to smallN.toInt),
        "served ranks are not the new generation's contiguous prefix")
    } finally cleanup()
  }
}
