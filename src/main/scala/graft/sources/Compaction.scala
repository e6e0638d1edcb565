package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the warehouse maintenance pass every
  * long-running ingest needs: streaming micro-batches and daily loads
  * accumulate many small parquet files, and at 100 TB the scan cost of
  * a table is dominated by file-open overhead and tiny row groups long
  * before byte count matters (a 128 MiB-target file is the standard
  * scan-efficient unit).
  *
  * `compact` rewrites a flat parquet directory into
  * ceil(totalBytes / targetBytes) files via `coalesce` — NO shuffle:
  * each output task reads several input files end-to-end, so the
  * rewrite moves every byte exactly once. Rewritten files land in a
  * sibling staging directory first and replace the original via two FS
  * renames — readers see the old generation until the swap, the same
  * staging discipline [[UpsertBucketedSink]] uses for tables. (On HDFS
  * and local FS the rename pair is near-atomic; an object-store
  * deployment would swap a metastore location pointer instead — same
  * lifecycle, different final pointer write.)
  *
  * Hive-partitioned layouts compact per partition directory (each
  * partition is a flat dir); bucketed TABLES must not pass through this
  * path — their file↔bucket mapping is load-bearing, so they recompact
  * by rewriting through their [[BucketedTableSink]] instead. */
object Compaction {

  /** Compaction report: files and bytes before/after. */
  final case class Report(filesBefore: Int, filesAfter: Int,
                          bytesBefore: Long, bytesAfter: Long)

  /** Rewrite `dir` (flat parquet) into ~`targetBytes` files.
    * No-op (returns None) when the directory already has no more files
    * than the target implies — compaction must be safe to run on a
    * schedule without rewriting healthy directories forever. */
  def compact(s: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): Option[Report] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(path)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles()
    val bytesBefore = before.map(_.getLen).sum
    val want = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)
    if (before.length <= want) return None

    val staging = new Path(dir + "_compact_staging")
    val retired = new Path(dir + "_compact_retired")
    fs.delete(staging, true)
    fs.delete(retired, true)
    // coalesce, not repartition: a pure file-merge pass, no shuffle
    s.read.parquet(dir).coalesce(want)
      .write.mode("overwrite").parquet(staging.toString)
    require(fs.rename(path, retired), s"compaction: cannot retire $dir")
    require(fs.rename(staging, path), s"compaction: cannot swap in $staging")
    fs.delete(retired, true)
    val after = dataFiles()
    Some(Report(before.length, after.length, bytesBefore, after.map(_.getLen).sum))
  }
}
