package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks. The reference writes straight to MySQL over JDBC with
  * hardcoded credentials (ETL_customer_interaction.py:73-80,
  * ETL_customer_behavior.py:145-158 — including a checked-in API key the
  * engine must NOT reproduce). Here the sink is a trait: tests use
  * Parquet/Console, production injects a [[JdbcSink]] with credentials
  * supplied by the caller.
  */
trait Sink {
  def write(df: DataFrame, table: String): Unit
}

/** Parquet warehouse directory; `overwrite` mirrors the reference's
  * JDBC overwrite mode. */
final case class ParquetSink(baseDir: String) extends Sink {
  def write(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/$table")
}

/** Hive-style partitioned parquet sink (`.../table/col=value/...`).
  * The day-partitioned relayout SURVEY §4 prescribes: date-ranged reads
  * prune whole directories at planning time instead of scanning 30
  * day-files (verified by PartitionPruningSpec). */
final case class PartitionedParquetSink(baseDir: String, partitionCols: String*)
    extends Sink {
  def write(df: DataFrame, table: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(s"$baseDir/$table")
}

/** Bucketed managed-table sink: pipeline outputs stored pre-partitioned
  * (and optionally pre-sorted) on the join key. `bucketBy` requires a
  * metastore table (`saveAsTable`) — the bucket spec is what lets a
  * recurring downstream join or aggregation on the bucket key read BOTH
  * sides with zero Exchange (BucketedJoinSpec pins the shuffle-free
  * plan). This is the sort-merge-bucket storage layout for 100 TB
  * fact-to-fact joins: pay one shuffle at write time, never again. */
final case class BucketedTableSink(
    buckets: Int,
    bucketCols: Seq[String],
    sortCols: Seq[String] = Nil,
    location: Option[String] = None) extends Sink {
  require(bucketCols.nonEmpty, "bucketed sink needs at least one bucket column")
  def write(df: DataFrame, table: String): Unit = {
    val writer = df.write.mode(SaveMode.Overwrite)
    // an explicit location makes the table EXTERNAL: the files outlive
    // the metastore entry, so another process can adopt them by DDL
    // (IndexCatalog's cross-process artifact reuse)
    location.foreach(writer.option("path", _))
    val bucketed = writer
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.isEmpty) bucketed
      else bucketed.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.saveAsTable(table)
    // Catalyst table + column statistics: the stored artifact is read by
    // MANY later plans, so one ANALYZE here buys accurate sizeInBytes /
    // rowCount / NDV for every join-strategy and reorder decision that
    // touches it (a size-unknown table defeats broadcast planning).
    df.sparkSession.sql(
      s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS " +
        (bucketCols ++ sortCols).distinct.mkString(", "))
  }
}

/** Keyed upsert (merge) into a bucketed managed table — the daily-load
  * pattern a Customer360 warehouse runs without a transactional table
  * format: each batch's rows REPLACE existing rows with the same key,
  * latest `versionCol` wins (ties broken by the remaining columns
  * descending, so the merge is deterministic under duplicate versions).
  *
  * Scale shape: merge = one co-bucketed union + one window pass on the
  * bucket key (no driver state), written to a STAGING table and swapped
  * in via metastore rename — never an in-place overwrite of a table the
  * plan is still reading, and never a driver-memory materialization.
  * The swap keeps the bucket spec (downstream zero-Exchange joins
  * survive) and the freshly-ANALYZEd statistics. UpsertSinkSpec pins
  * upsert(day1) ∘ upsert(day2) ≡ keep-latest over day1 ∪ day2.
  *
  * `scopeCols` (optional) makes a batch own whole GROUPS, not just the
  * exact keys it carries: existing rows whose scope key appears in the
  * incoming batch — at a version not newer than the batch's version for
  * that scope — are dropped before the keyed merge. Needed when a
  * group's row COUNT can shrink between generations (a re-streamed ANN
  * query landing in a smaller IVF cell returns fewer ranks; without
  * scope ownership the stale higher ranks survive the per-key merge —
  * the mixed-generation serving surface, round-12 advice item 1).
  * Version-guarded, so an out-of-order replay can never delete rows a
  * NEWER generation wrote.
  *
  * By default the owned scopes are derived from the OUTPUT rows — which
  * misses a scope whose new generation is EMPTY (a re-streamed ANN
  * query probing an empty cell returns zero rows, so its query_id never
  * appears in `df` and the old generation keeps serving — round-13
  * advice item 5). Callers that can produce empty groups pass the
  * INPUT-derived scope frame (scopeCols + versionCol) to
  * `write(df, table, scopeFrame)` instead. */
final case class UpsertBucketedSink(
    buckets: Int,
    keyCols: Seq[String],
    versionCol: String,
    scopeCols: Seq[String] = Nil) extends Sink {
  require(keyCols.nonEmpty, "upsert sink needs at least one key column")
  require(scopeCols.forall(keyCols.contains),
    "scopeCols must be a subset of keyCols (a scope is a key-group owner)")

  def write(df: DataFrame, table: String): Unit =
    write(df, table, scopeFrame = None)

  def write(df: DataFrame, table: String,
            scopeFrame: Option[DataFrame]): Unit = {
    // an explicit scope frame on a sink with no scopeCols would be
    // silently ignored — the exact silent-ownership-drop class this
    // parameter exists to close; refuse loudly instead
    require(scopeFrame.isEmpty || scopeCols.nonEmpty,
      "scopeFrame passed to an UpsertBucketedSink with no scopeCols — " +
        "declare the scope columns or drop the frame")
    val s = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, col, max, row_number}
    // a crash between the swap's DROP and RENAME leaves the full merged
    // state under the staging name and no serving table; adopt it, or
    // the replayed batch would fresh-create from its own rows alone
    StagingSwap.recover(s, table, table + "_upsert_staging")
    val inner = BucketedTableSink(buckets, keyCols)
    if (!s.catalog.tableExists(table)) inner.write(df, table)
    else {
      val existing =
        if (scopeCols.isEmpty) s.table(table)
        else {
          // batch-owned scopes: per scope key, the batch's max version;
          // existing rows of that scope at <= that version are replaced
          // WHOLESALE (the scope frame is batch-bounded — broadcast
          // side). An explicit scopeFrame (the caller's INPUT keys)
          // also owns scopes whose new generation is empty.
          val scopes = scopeFrame.getOrElse(df)
            .groupBy(scopeCols.map(col): _*)
            .agg(max(col(versionCol)).as("_scope_ver"))
          s.table(table)
            .join(broadcast(scopes), scopeCols, "left_outer")
            .filter(col("_scope_ver").isNull ||
              col(versionCol) > col("_scope_ver"))
            .drop("_scope_ver")
        }
      val all = existing.unionByName(df)
      val others = all.columns
        .filterNot(c => keyCols.contains(c) || c == versionCol).toSeq
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy((col(versionCol) +: others.map(col)).map(_.desc): _*)
      val merged = all
        .withColumn("_upsert_rn", row_number().over(w))
        .filter(col("_upsert_rn") === 1)
        .drop("_upsert_rn")
      val staging = table + "_upsert_staging"
      inner.write(merged, staging)
      s.sql(s"DROP TABLE IF EXISTS $table")
      s.sql(s"ALTER TABLE $staging RENAME TO $table")
      // each SESSION's catalog caches the resolved relation (file
      // listing included) under the table name; after the swap those
      // caches still point at the dropped generation's files, so the
      // next read in that session would hit ghosts. Refresh the writing
      // session AND the default session (streaming foreachBatch runs in
      // a clone — the main session is usually the reader). Readers in
      // further sessions must refresh themselves, as with any
      // non-transactional Hive-style swap.
      s.catalog.refreshTable(table)
      org.apache.spark.sql.SparkSession.getDefaultSession
        .filter(_ ne s)
        .filter(_.catalog.tableExists(table))
        .foreach(_.catalog.refreshTable(table))
    }
  }
}

/** Crash recovery for the DROP-then-RENAME staging swaps
  * ([[UpsertBucketedSink]], WinnowStreams.purgeSupersededPairs): the
  * swap's two statements are not atomic, and a crash between them
  * leaves the COMPLETE new state under the staging name with no serving
  * table. Without recovery, the restarted batch sees tableExists=false
  * and fresh-creates the table from its own rows — silently discarding
  * everything accumulated (round-12 advice item 3). The staging table
  * is only ever written in full before the DROP, so adopting it IS the
  * committed state. */
object StagingSwap {
  /** If `table` is missing but `staging` exists, complete the
    * interrupted swap by renaming staging in. Returns true if it
    * recovered. */
  def recover(s: org.apache.spark.sql.SparkSession,
              table: String, staging: String): Boolean =
    if (!s.catalog.tableExists(table) && s.catalog.tableExists(staging)) {
      s.sql(s"ALTER TABLE $staging RENAME TO $table")
      s.catalog.refreshTable(table)
      true
    } else false
}

/** Debug sink (`result.show()` at ETL_customer_behavior.py:202). */
final case class ConsoleSink(numRows: Int = 20) extends Sink {
  def write(df: DataFrame, table: String): Unit = df.show(numRows, truncate = false)
}

/** JDBC sink with injected credentials. `truncate=true` keeps the target
  * table's DDL (indexes, grants) instead of the reference's drop+recreate
  * overwrite — safer for a live warehouse; set false for exact parity. */
final case class JdbcSink(
    url: String,
    user: String,
    password: String,
    driver: String = "com.mysql.cj.jdbc.Driver",
    truncate: Boolean = true) extends Sink {
  def write(df: DataFrame, table: String): Unit =
    df.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      .option("truncate", truncate.toString)
      .mode(SaveMode.Overwrite)
      .save()
}
