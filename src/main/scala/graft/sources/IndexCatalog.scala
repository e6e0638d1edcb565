package graft.sources

import java.nio.file.Paths
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted-index catalog: the train-once / query-many lifecycle for
  * expensive derived state (trained IVF quantizers, LSH near-dup pairs,
  * dedup keep-lists).
  *
  * Round-2 verdict finding: `q_ann_ivf_probe2` re-trained the k-means
  * quantizer `q_ann_ivf` had just trained, and `q_corpus_curation` re-ran
  * the whole LSH + connected-components chain inline — at 100 TB an index
  * is trained ONCE and stored as tables (centroids, assignments,
  * drop-lists), and every query consumes the stored artifact. This object
  * is that storage layer, scaled down to the harness: the first caller
  * per (application, key) runs `build`, which materializes whatever
  * artifacts it wants (parquet under a per-key scratch dir, or bucketed
  * metastore tables via [[BucketedTableSink]]); later callers skip
  * straight to the read. Because every builder in this repo is
  * deterministic (seeded integer-space training, md5-derived hyperplanes),
  * a query reading the artifact returns bit-identical rows to one that
  * recomputed it, so the DuckDB oracles are unaffected.
  *
  * Scope notes:
  *  - memoization is per Spark application (`applicationId` keys the
  *    entry), so a fresh `Verify`/`Bench` run rebuilds rather than
  *    trusting stale files from a previous process;
  *  - builders fully materialize before returning, so they can (and must)
  *    `unpersist` any frames they cached — no cache outlives its builder
  *    (CacheDisciplineSpec pins this);
  *  - the artifact root defaults to `target/graft-catalog` (gitignored)
  *    and is overridable via GRAFT_CATALOG_DIR for real deployments.
  */
object IndexCatalog {

  /** (applicationId | key) → scratch dir of the built artifact set. */
  private val built = TrieMap.empty[String, String]

  private def root: String =
    sys.env.getOrElse(
      "GRAFT_CATALOG_DIR",
      Paths.get(sys.props("user.dir"), "target", "graft-catalog").toString)

  /** Stable 8-hex tag for embedding arbitrary strings (sf-dir paths,
    * parameter lists) in artifact keys and table names. */
  def tag(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  }

  /** Metastore-safe table name for a bucketed artifact: unique per
    * (key, application) so a re-run never collides with a leftover
    * warehouse dir from a previous process. */
  def tableName(spark: SparkSession, key: String): String =
    s"graft_idx_${key}_${tag(spark.sparkContext.applicationId)}"

  /** Ensure the artifact set `key` exists for this application: the first
    * caller runs `build(scratchDir)` (which writes its artifacts under
    * `scratchDir` and/or creates metastore tables); everyone else reuses.
    * Returns the scratch dir. Single-threaded callers assumed (the
    * harness mains and test suites are); a lost race would only build the
    * same deterministic artifact twice. */
  def ensure(spark: SparkSession, key: String)(build: String => Unit): String =
    built.getOrElseUpdate(s"${spark.sparkContext.applicationId}|$key", {
      val dir = Paths.get(root, spark.sparkContext.applicationId, key).toString
      build(dir)
      dir
    })
}
