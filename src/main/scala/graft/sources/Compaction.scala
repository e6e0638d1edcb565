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
  * renames. CAVEAT: between the two renames `dir` does not exist, so a
  * reader that PLANS a scan inside that window fails with
  * path-not-found (a reader planned before it keeps its file list and
  * is fine). A crash inside the window is recovered on the next
  * `compact` call, which restores the retired directory before doing
  * anything else. Deployments whose readers may plan at any moment
  * should use [[compactGeneration]] instead — it compacts INTO a new
  * generation of a [[GenerationedTable]], so no directory ever
  * disappears and the swap is one pointer write.
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
    val staging = new Path(dir + "_compact_staging")
    val retired = new Path(dir + "_compact_retired")
    // Crash recovery: a previous run that died between the two renames
    // left the table in `_compact_retired` with `dir` missing — restore
    // it before anything else, so no data is ever stranded.
    if (!fs.exists(path) && fs.exists(retired))
      require(fs.rename(retired, path),
        s"compaction: cannot restore $retired after a crashed swap")
    def dataFiles() = fs.listStatus(path)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles()
    val bytesBefore = before.map(_.getLen).sum
    val want = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)
    if (before.length <= want) return None

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

  /** Generation-aware compaction: rewrite the LATEST generation of a
    * [[GenerationedTable]] into ~`targetBytes` files AS A NEW
    * GENERATION. No directory is ever renamed or removed, so a reader
    * pinned to (or planned against) generation N is untouched while
    * the pointer swings to the compacted N+1; old generations are
    * reclaimed later by the table's own `vacuum`, which respects
    * retention and never deletes the pointed-at snapshot. This is the
    * maintenance pass a continuously-ingesting generationed table
    * needs — the ingest writes many small files per generation, and
    * compaction periodically folds the newest snapshot into
    * scan-efficient units without interrupting anyone. */
  def compactGeneration(s: SparkSession, dir: String,
                        targetBytes: Long = 128L << 20): Option[Report] = {
    val g = GenerationedTable.latest(s, dir).getOrElse(return None)
    val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path) = fs.listStatus(p)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val genDir = new Path(dir, s"gen=$g")
    val before = dataFiles(genDir)
    val bytesBefore = before.map(_.getLen).sum
    val want = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)
    if (before.length <= want) return None
    val next = GenerationedTable.write(
      s.read.parquet(genDir.toString).coalesce(want), dir)
    val after = dataFiles(new Path(dir, s"gen=$next"))
    Some(Report(before.length, after.length, bytesBefore, after.map(_.getLen).sum))
  }
}
