package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted-delete (right-to-be-forgotten) audit over the artifact
  * tier.
  *
  * The deletion flow this audits (DeleteAuditSpec drives it end to
  * end over the real builders):
  *
  *  1. the corpus lives behind a [[LogTable]]; a delete is an upsert of
  *     tombstone rows (the table's documented delete contract), and
  *     [[graft.operators.TableChanges.diff]] between the pre/post
  *     generations IS the audited provenance of exactly which keys were
  *     erased;
  *  2. the served corpus snapshot is re-materialized without tombstoned
  *     rows — same path, new content;
  *  3. every [[IndexCatalog]] artifact over that corpus invalidates BY
  *     CONSTRUCTION: the manifest's input fingerprint (name/length/
  *     mtime walk) no longer matches, so the next `ensure` rebuilds
  *     from the purged corpus — no per-artifact bookkeeping, no
  *     "forgot to invalidate" class of bug;
  *  4. [[survivors]] proves the end state: zero rows in any served
  *     artifact still reference a deleted key.
  *
  * Scale shape: the deleted-key set is the small side (a deletion
  * request, not a corpus) and broadcasts; each artifact is scanned once
  * per declared id column — corpus-linear, no joins wider than the
  * artifact itself. Counts collapse to one number per (artifact,
  * id column): audit-report-sized driver data only. */
object DeleteAudit {

  /** Rows in each artifact still referencing any deleted id.
    *
    * @param deleted   one-column frame of deleted keys
    * @param artifacts (name, frame, id columns to scan) per artifact
    * @return (artifact, id_col, n_rows) — all-zero `n_rows` is the
    *         zero-survivors certificate
    */
  def survivors(
      deleted: DataFrame,
      artifacts: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    val s = deleted.sparkSession
    import s.implicits._
    val del = deleted.select(col(deleted.columns.head).as("_del_id"))
    artifacts.flatMap { case (name, frame, idCols) =>
      idCols.map { c =>
        val n = frame
          .join(broadcast(del), frame(c) === col("_del_id"), "left_semi")
          .count()
        (name, c, n)
      }
    }.toDF("artifact", "id_col", "n_rows")
  }
}
