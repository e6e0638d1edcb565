package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-versioned parquet table — snapshot isolation and
  * time-travel reads without a transactional table format, the same
  * niche [[UpsertBucketedSink]]'s staging swap fills for merges:
  *
  *  - every write lands a COMPLETE new snapshot under `gen=<k>/`;
  *  - `_LATEST` is a one-line pointer file, replaced via write-to-temp
  *    + rename (near-atomic on HDFS/local; an object-store deployment
  *    swaps a metastore pointer instead — same lifecycle);
  *  - readers resolve the pointer at plan time, so an in-flight write
  *    never tears a running scan (it reads the OLD complete snapshot);
  *  - `read(gen = Some(k))` is time travel to any retained snapshot;
  *  - `vacuum(keep)` deletes old generations once downstream consumers
  *    have moved on — retention is the operator's contract, exactly as
  *    with VACUUM in transactional formats.
  *
  * Single-writer by contract (a nightly build or a foreachBatch sink);
  * two concurrent writers would race the pointer, last rename wins with
  * both snapshots intact on disk. */
object GenerationedTable {

  private def fs(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_LATEST")

  /** Write `df` as the next generation and swing the pointer. Returns
    * the new generation number. */
  def write(df: DataFrame, dir: String): Int =
    writeAs(df, dir, generations(df.sparkSession, dir).lastOption.getOrElse(0) + 1)

  /** Write `df` under an EXPLICIT generation number (overwriting any
    * partial snapshot a crashed writer left there) and swing the
    * pointer. Lets a multi-table store commit sibling tables under one
    * externally-chosen generation instead of trusting two independent
    * counters to stay in lockstep (see [[graft.operators.IvfLifecycle]]). */
  def writeAs(df: DataFrame, dir: String, next: Int): Int = {
    val s = df.sparkSession
    val f = fs(s, dir)
    df.write.mode("overwrite").parquet(s"$dir/gen=$next")
    val tmp = new Path(dir, s"_LATEST.tmp")
    val out = f.create(tmp, true)
    out.write(next.toString.getBytes("UTF-8"))
    out.close()
    f.delete(pointer(dir), false)
    require(f.rename(tmp, pointer(dir)), s"cannot swing $dir/_LATEST")
    next
  }

  /** Retained generation numbers, ascending. */
  def generations(s: SparkSession, dir: String): Seq[Int] = {
    val f = fs(s, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toInt)
      .sorted
  }

  /** Latest generation per the pointer (None before any write). */
  def latest(s: SparkSession, dir: String): Option[Int] = {
    val f = fs(s, dir)
    if (!f.exists(pointer(dir))) return None
    val in = f.open(pointer(dir))
    // Read the stream fully — a single read() may return fewer bytes
    // than available (or -1 on a zero-length not-yet-flushed pointer);
    // an empty/unparseable pointer degrades to None, not a crash.
    val content =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val bytes = new Array[Byte](64)
        var n = in.read(bytes)
        while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
        buf.toString("UTF-8").trim
      } finally in.close()
    content.toIntOption
  }

  /** Read the latest snapshot, or time-travel to `gen`. */
  def read(s: SparkSession, dir: String, gen: Option[Int] = None): DataFrame = {
    val g = gen.orElse(latest(s, dir)).getOrElse(
      throw new IllegalStateException(s"$dir has no generations"))
    require(generations(s, dir).contains(g), s"generation $g not retained in $dir")
    s.read.parquet(s"$dir/gen=$g")
  }

  /** [[writeAs]], but the pointer NEVER swings backward: replaying an
    * already-applied micro-batch (streaming delete propagation,
    * [[graft.streaming.DeleteStreams]]) rewrites its old snapshot in
    * place — deterministic content, idempotent — while readers keep
    * resolving the newest committed generation. */
  def replayAs(df: DataFrame, dir: String, gen: Int): Int = {
    val s = df.sparkSession
    if (latest(s, dir).exists(_ > gen)) {
      df.write.mode("overwrite").parquet(s"$dir/gen=$gen")
      gen
    } else writeAs(df, dir, gen)
  }

  /** Delete all but the newest `keep` generations (never the pointed-at
    * one). Returns the deleted generation numbers. */
  def vacuum(s: SparkSession, dir: String, keep: Int): Seq[Int] = {
    require(keep >= 1, "must keep at least one generation")
    val f = fs(s, dir)
    val gens = generations(s, dir)
    val current = latest(s, dir)
    val drop = gens.dropRight(keep).filterNot(current.contains(_))
    drop.foreach(g => f.delete(new Path(dir, s"gen=$g"), true))
    drop
  }
}
