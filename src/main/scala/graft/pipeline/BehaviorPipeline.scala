package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{TopKeyword, Trend}
import graft.semantic.{KeywordClassifier, RuleClassifier}
import graft.sources.{Sink, Sources}

/** Pipeline B — customer search-behavior trends (reference
  * ETL_customer_behavior.py end to end, re-planned per SURVEY §3.2/§3.3):
  *
  *   one multi-path parquet read per month (not 14 unioned scans)
  *   → per-user top keyword (deterministic tie-break)
  *   → distributed keyword classification (distinct → classify →
  *     broadcast join; no driver collect, no 10k cap, no hardcoded key)
  *   → June × July inner join → trend/category-change derivation
  *   → injected sink.
  */
object BehaviorPipeline {

  /** Per-month half: top keyword + category, suffixed columns. */
  def monthProfile(spark: SparkSession, dayDirs: Seq[String], suffix: String,
                   classifier: KeywordClassifier): DataFrame = {
    val top = TopKeyword(Sources.searchLogs(spark, dayDirs))
    classifier
      .applyDistinct(spark, top, "most_search", "category")
      .select(
        col("user_id"),
        col("most_search").as(s"most_search_$suffix"),
        col("category").as(s"category_$suffix"))
  }

  /** Build the behavior frame (lazy; no action). */
  def build(spark: SparkSession, juneDirs: Seq[String], julyDirs: Seq[String],
            classifier: KeywordClassifier = RuleClassifier): DataFrame =
    Trend(
      monthProfile(spark, juneDirs, "T6", classifier),
      monthProfile(spark, julyDirs, "T7", classifier))

  /** Run end to end into a sink (table `behavior_data`). */
  def run(spark: SparkSession, juneDirs: Seq[String], julyDirs: Seq[String],
          sink: Sink, classifier: KeywordClassifier = RuleClassifier): Unit =
    sink.write(build(spark, juneDirs, julyDirs, classifier), "behavior_data")
}
