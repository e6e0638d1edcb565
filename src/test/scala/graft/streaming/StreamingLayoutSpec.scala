package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout-maintenance-on-arrival: out-of-order replay reproduces the
  * batch layout's file statistics exactly; a re-ingested batch never
  * double-counts a document into a file; late arrivals only widen (or
  * keep) each file's bounding ranges. */
class StreamingLayoutSpec extends SparkSpec {

  private val outD = "/tmp/graft_laystream"

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(outD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def statsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  /** Ledger seeded once per suite run (lazy fixture, the
    * StreamingAdmissionSpec model): each test forces it, so either
    * test runs green in isolation and no test reads a stale /tmp
    * ledger from an older code version (round-16 advice — the
    * late-arrival test used to depend on the replay test having run
    * first in the same JVM). */
  private lazy val seeded: Unit = {
    cleanup()
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text")
    LayoutStreams.assignBatch(docs.filter(col("doc_id") % 3 === 1), 0L, outD)
    LayoutStreams.assignBatch(docs.filter(col("doc_id") % 3 === 2), 1L, outD)
    LayoutStreams.assignBatch(docs.filter(col("doc_id") % 3 === 0), 2L, outD)
  }

  test("out-of-order replay reproduces the batch layout stats; " +
    "re-ingest never double-counts") {
    seeded
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text")

    val got = statsMap(LayoutStreams.layoutStats(spark, outD))
    val want = statsMap(
      graft.operators.LayoutQueries.zorderLayout.run(spark, sf0001))
    assert(got == want, "streamed layout stats diverge from the batch pass")

    // replay an old slice under a new batch id: newest-wins, same stats
    LayoutStreams.assignBatch(docs.filter(col("doc_id") % 3 === 1), 3L, outD)
    assert(statsMap(LayoutStreams.layoutStats(spark, outD)) == want,
      "a replayed batch changed the layout stats")
  }

  test("late arrivals only widen or keep each file's bounding ranges") {
    seeded
    val before = statsMap(LayoutStreams.layoutStats(spark, outD))
    // synthetic late doc: lands in some cell, must only widen it
    val late = Seq((990001L, "srcX", (1 to 500).map(i => s"w$i").mkString(" ")))
    import spark.implicits._
    LayoutStreams.assignBatch(
      late.toDF("doc_id", "source", "text"), 4L, outD)
    val after = statsMap(LayoutStreams.layoutStats(spark, outD))
    assert(after.values.map(_._1).sum == before.values.map(_._1).sum + 1,
      "exactly one document must join the layout")
    before.foreach { case (f, (n, lo1, hi1, lo2, hi2)) =>
      val (n2, l1, h1, l2, h2) = after(f)
      assert(n2 >= n && l1 <= lo1 && h1 >= hi1 && l2 <= lo2 && h2 >= hi2,
        s"file $f shrank on a late arrival: $before -> $after")
    }
  }
}
