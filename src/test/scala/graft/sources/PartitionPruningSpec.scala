package graft.sources

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The hive-layout relayout must enable real partition pruning: a date
  * predicate eliminates non-matching partitions at planning time. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned relayout prunes partitions for date predicates") {
    val base = Files.createTempDirectory("graft_part").toString
    val events = Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
    PartitionedParquetSink(base, "day").write(events, "events_by_day")

    val reread = spark.read.parquet(s"$base/events_by_day")
    val pruned = reread.filter(col("day") === "20240105")

    // correctness: pruned read equals a post-hoc filter over the original
    // (collect() on `pruned` itself so ITS scan metrics populate below)
    val expected = events.filter(col("day") === "20240105").count()
    assert(pruned.collect().length == expected && expected > 0)

    // plan: the date predicate becomes a partition filter, and only one
    // of ~30 day-partitions is actually read (scan metrics)
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.toString.contains("PartitionFilters: [isnotnull(day"),
      s"date predicate did not become a partition filter:\n${scans.head}")
    val filesRead = scans.head.metrics("numFiles").value
    val totalParts = Files.list(java.nio.file.Paths.get(s"$base/events_by_day"))
      .filter(p => p.getFileName.toString.startsWith("day=")).count()
    assert(filesRead < totalParts,
      s"read $filesRead files out of $totalParts partitions — no pruning")
    assert(filesRead >= 1 && filesRead <= 2, s"expected ~1 file read, got $filesRead")
  }

  test("dynamic partition pruning: a selective dim filter prunes the fact scan at runtime") {
    // the 100 TB fact-dim shape: the partition predicate is NOT a literal
    // on the fact table — it arrives through a join with a filtered
    // dimension, and DPP must push it into the partitioned scan anyway
    val base = Files.createTempDirectory("graft_dpp").toString
    val events = Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
    PartitionedParquetSink(base, "day").write(events, "events_by_day")

    val fact = spark.read.parquet(s"$base/events_by_day")
    val dim = events.select("day").distinct()
      .withColumn("is_audit_day", col("day") === "20240105")
    val joined = fact
      .join(dim.filter(col("is_audit_day")), Seq("day"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))

    val expected = events.filter(col("day") === "20240105")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(joined).count() == 0)

    joined.collect() // populate scan metrics + finalize AQE

    // AQE wraps materialized stages in QueryStageExec nodes that a plain
    // collect() does not descend into — walk them explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(joined.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("events_by_day")))
    assert(scans.nonEmpty)
    assert(scans.head.toString.contains("dynamicpruning"),
      s"join predicate did not become a dynamic partition filter:\n${scans.head.toString.take(2000)}")
    val filesRead = scans.head.metrics("numFiles").value
    val totalParts = Files.list(java.nio.file.Paths.get(s"$base/events_by_day"))
      .filter(p => p.getFileName.toString.startsWith("day=")).count()
    assert(filesRead < totalParts,
      s"DPP read $filesRead of $totalParts partitions — no runtime pruning")
  }
}
