package graft.schema

import org.apache.spark.sql.types._

/** Explicit input schemas for the Customer360 pipelines (SURVEY.md §1).
  *
  * The reference infers everything at read time (JSON inference at
  * ETL_customer_interaction.py:64, parquet footer metadata) — at 100 TB
  * schema inference is an extra pass over the data and a determinism
  * hazard, so the engine declares both schemas and keeps inference only
  * as a parity-testing escape hatch.
  */
object Schemas {

  /** Interaction logs: Elasticsearch-export NDJSON, one object per line
    * (reference data/log_content_sample/20220401.json:1). Only `_source`
    * survives the first projection. */
  val interactionLog: StructType = StructType(Seq(
    StructField("_index", StringType),
    StructField("_type", StringType),
    StructField("_id", StringType),
    StructField("_score", LongType),
    StructField("_source", StructType(Seq(
      StructField("Contract", StringType),
      StructField("Mac", StringType),
      StructField("TotalDuration", LongType),
      StructField("AppName", StringType))))))

  /** Search logs: day-partitioned snappy parquet (reference
    * data/log_search/20220701 footer). `datetime` is stored as a string
    * in the source — kept as-is for parity (SURVEY §1.4). */
  val searchLog: StructType = StructType(Seq(
    StructField("eventID", StringType),
    StructField("datetime", StringType),
    StructField("user_id", StringType),
    StructField("keyword", StringType),
    StructField("category", StringType),
    StructField("proxy_isp", StringType),
    StructField("platform", StringType),
    StructField("networkType", StringType),
    StructField("action", StringType),
    StructField("userPlansMap", ArrayType(StringType))))

  /** Typed façade for the interaction rows after envelope unwrap. */
  final case class InteractionLog(
      Contract: String, Mac: String, TotalDuration: Long, AppName: String)

  /** Typed façade for search-log rows (pipeline-relevant columns). */
  final case class SearchLog(
      eventID: String, datetime: String, user_id: String, keyword: String)

  /** Output row of the interaction pipeline (README.md:80-100 schema;
    * `Most Watched` carries a space in the warehouse table — preserved). */
  final case class EngagementRow(
      Contract: String,
      Total_Giai_Tri: Long, Total_Phim_Truyen: Long, Total_The_Thao: Long,
      Total_Thieu_Nhi: Long, Total_Truyen_Hinh: Long,
      Active: Long, `Most Watched`: String, Taste: String,
      Level_Activeness: String)

  /** Output row of the behavior pipeline (README.md:103-113 schema). */
  final case class BehaviorRow(
      user_id: String,
      most_search_T6: String, category_T6: String,
      most_search_T7: String, category_T7: String,
      Trending_Type: String, Category_Change: String)
}
