package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-structured keyed table over [[GenerationedTable]] — the
  * continuous-ingest storage pattern a transactional format provides,
  * built from the same two primitives this repo already trusts
  * (complete-snapshot generations + a near-atomic pointer):
  *
  *  - `append` writes each batch as a DELTA generation — write cost is
  *    O(|batch|), never O(table) (the difference from re-snapshotting
  *    the world per micro-batch, which is the nightly build's shape,
  *    not a streaming sink's);
  *  - `read` unions the retained generations up to the pinned (or
  *    latest) one and keeps the newest row per key — highest
  *    `versionCol` wins, version ties broken by generation (a
  *    same-version rewrite in a later delta supersedes), then the
  *    remaining columns descending. Version-seniority is what makes a
  *    REPLAYED batch harmless: a restart re-appends old rows as a new
  *    delta, but their stale versions lose the window race to every
  *    newer upsert — replay-safe at READ level with no write-side
  *    coordination;
  *  - `compact` folds everything up to the latest generation into ONE
  *    merged snapshot generation, bounding read fan-in; readers pinned
  *    to older generations are untouched (no directory is removed),
  *    and `GenerationedTable.vacuum` reclaims history under the same
  *    retention contract as any snapshot table.
  *
  * Read cost grows with the number of deltas since the last
  * compaction — the standard log-structured trade, amortized by
  * compacting every N batches (the streaming spec drives exactly that
  * maintenance loop). Upsert-only by design: a delete is an upsert of
  * a tombstone column the reader filters, as in the reference's
  * overwrite-only sinks. */
final case class LogTable(dir: String, keyCols: Seq[String], versionCol: String) {
  require(keyCols.nonEmpty, "log table needs at least one key column")

  /** Append one batch as a new delta generation. Returns its number. */
  def append(batch: DataFrame): Int =
    GenerationedTable.write(batch, dir)

  /** This table's id-bearing generation store, for the
    * right-to-be-forgotten audit ([[DeleteAudit
    * .survivorsFromGenerations]]): every retained delta carries keyed
    * rows — including the TOMBSTONE that marked a key deleted — so the
    * key survives in history until [[DeleteAudit.purgeGenerations]]
    * rewrites the offending deltas (after which no retained generation,
    * and therefore no [[read]] at any `upTo`, can resurrect it). */
  def auditRelation: (String, String, Seq[String]) =
    (s"log:$dir", dir, keyCols)

  /** Keep-latest view across generations ≤ `upTo` (default: pointer). */
  def read(s: SparkSession, upTo: Option[Int] = None): DataFrame = {
    val g = upTo.orElse(GenerationedTable.latest(s, dir)).getOrElse(
      throw new IllegalStateException(s"$dir has no generations"))
    val gens = GenerationedTable.generations(s, dir).filter(_ <= g)
    val all = gens.map { n =>
      GenerationedTable.read(s, dir, Some(n)).withColumn("_gen", lit(n))
    }.reduce(_ unionByName _)
    val others = all.columns
      .filterNot(c => keyCols.contains(c) || c == versionCol || c == "_gen")
      .toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(versionCol) +: col("_gen") +: others.map(col)).map(_.desc): _*)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_gen")
  }

  /** CDC read: the effective insert/update/delete feed between the
    * keep-latest views at two generations — what an incremental
    * consumer processes instead of re-reading the whole table after
    * each batch ([[graft.operators.TableChanges.diff]] over two
    * [[read]]s; one full-outer join on the keys, unchanged rows
    * dropped). `versionCol` rides along as a value column, so a pure
    * version bump with unchanged payload still surfaces as an update —
    * consumers that only care about payload can drop the
    * `old_/new_<versionCol>` pair before comparing. */
  def changes(s: SparkSession, fromGen: Int, toGen: Int): org.apache.spark.sql.DataFrame =
    graft.operators.TableChanges.diff(
      read(s, Some(fromGen)), read(s, Some(toGen)), keyCols)

  /** Fold all current generations into one merged snapshot generation.
    * Returns its number (None when there is nothing to fold). */
  def compact(s: SparkSession): Option[Int] = {
    val latest = GenerationedTable.latest(s, dir).getOrElse(return None)
    if (GenerationedTable.generations(s, dir).count(_ <= latest) <= 1) return None
    Some(GenerationedTable.write(read(s, Some(latest)), dir))
  }

  /** Streaming wiring: apply a micro-batch stream of keyed rows,
    * compacting every `compactEvery` batches so read fan-in stays
    * bounded while the stream runs. */
  def sink(rows: DataFrame, compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          append(batch)
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            compact(batch.sparkSession)
          ()
        }
      }
}
