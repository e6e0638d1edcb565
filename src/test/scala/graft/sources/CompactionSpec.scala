package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Compaction must shrink a fragmented directory to the byte-target
  * file count, preserve content exactly, and be a scheduled-job-safe
  * no-op on an already-healthy directory. */
class CompactionSpec extends SparkSpec {

  private def fragmented(dir: String, parts: Int): Unit =
    Tables.events(spark, sf0001)
      .repartition(parts)
      .write.mode("overwrite").parquet(dir)

  test("compacting a fragmented directory preserves content exactly") {
    val dir = "/tmp/graft_compact_spec"
    fragmented(dir, 37)
    val before = spark.read.parquet(dir)
    val beforeRows = before.count()
    val beforeSum = before.agg(sum("event_id")).collect()(0).getLong(0)

    val report = Compaction.compact(spark, dir, targetBytes = 512L << 20).get
    assert(report.filesBefore == 37 && report.filesAfter == 1,
      s"expected 37 -> 1 files, got $report")

    val after = spark.read.parquet(dir)
    assert(after.count() == beforeRows)
    assert(after.agg(sum("event_id")).collect()(0).getLong(0) == beforeSum)
    // set equality, not just aggregates
    assert(after.exceptAll(Tables.events(spark, sf0001)).count() == 0)
    assert(Tables.events(spark, sf0001).exceptAll(after).count() == 0)
  }

  test("a byte target below file sizes yields multiple output files") {
    val dir = "/tmp/graft_compact_spec2"
    fragmented(dir, 16)
    // tiny target: every output file caps near the target, so the
    // rewrite still fans out instead of producing one giant file
    val report = Compaction.compact(spark, dir, targetBytes = 8L << 10).get
    assert(report.filesAfter > 1 && report.filesAfter < 16, s"got $report")
    assert(spark.read.parquet(dir).count() ==
      Tables.events(spark, sf0001).count())
  }

  test("an already-healthy directory is a no-op") {
    val dir = "/tmp/graft_compact_spec3"
    fragmented(dir, 2)
    assert(Compaction.compact(spark, dir, targetBytes = 512L << 20).isEmpty
      || spark.read.parquet(dir).count() == Tables.events(spark, sf0001).count())
    // after one compaction, a second run with the same target must no-op
    Compaction.compact(spark, dir, targetBytes = 512L << 20)
    assert(Compaction.compact(spark, dir, targetBytes = 512L << 20).isEmpty,
      "compaction re-ran on a directory it just compacted")
  }
}
