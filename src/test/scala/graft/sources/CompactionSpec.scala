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

  test("a crash between the two swap renames is recovered on the next run") {
    val dir = "/tmp/graft_compact_crash"
    fragmented(dir, 8)
    val rows = spark.read.parquet(dir).count()
    // simulate dying between rename(dir, retired) and rename(staging, dir):
    // the table sits in _compact_retired and dir does not exist
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retired = new org.apache.hadoop.fs.Path(dir + "_compact_retired")
    fs.delete(retired, true)
    assert(fs.rename(p, retired))
    assert(!fs.exists(p))
    // next scheduled run restores the data, then compacts it
    val report = Compaction.compact(spark, dir, targetBytes = 512L << 20).get
    assert(report.filesBefore == 8 && report.filesAfter == 1)
    assert(spark.read.parquet(dir).count() == rows, "data lost in recovery")
    assert(!fs.exists(retired))
  }

  test("generation-aware compaction never disturbs a pinned reader") {
    val dir = "/tmp/graft_compact_gen"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    // ingest writes a fragmented generation 1
    GenerationedTable.write(
      Tables.events(spark, sf0001).repartition(21), dir)
    val gen1Files = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "gen=1"))
      .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    assert(gen1Files == 21)
    // a reader pins generation 1 BEFORE compaction runs
    val pinned = GenerationedTable.read(spark, dir, Some(1))
    val rows = pinned.count()
    // compaction writes the compacted snapshot as generation 2
    val report = Compaction.compactGeneration(spark, dir,
      targetBytes = 512L << 20).get
    assert(report.filesBefore == 21 && report.filesAfter == 1, s"got $report")
    assert(GenerationedTable.latest(spark, dir).contains(2))
    // the pinned reader still scans its complete, untouched snapshot
    assert(pinned.count() == rows)
    assert(GenerationedTable.read(spark, dir, Some(1)).count() == rows)
    // new readers get the compacted generation with identical content
    val latest = GenerationedTable.read(spark, dir)
    assert(latest.count() == rows)
    assert(latest.exceptAll(pinned).count() == 0)
    // a second compaction pass is a no-op (gen 2 is already healthy)
    assert(Compaction.compactGeneration(spark, dir,
      targetBytes = 512L << 20).isEmpty)
    // vacuum reclaims gen 1 only after retention allows, never gen 2
    assert(GenerationedTable.vacuum(spark, dir, keep = 1) == Seq(1))
    assert(GenerationedTable.read(spark, dir).count() == rows)
    fs.delete(p, true)
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
