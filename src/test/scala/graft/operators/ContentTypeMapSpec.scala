package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SURVEY §5.1: C1 mapping table (all 14 AppName values + unknown ⇒
  * Error ⇒ filtered), F1 sentinel/null drop. */
class ContentTypeMapSpec extends SparkSpec {
  import spark.implicits._

  private def typed(rows: (String, String, Long)*) = {
    val df = rows.toDF("Contract", "AppName", "TotalDuration")
      .withColumn("log_date", org.apache.spark.sql.functions.current_date())
    ContentTypeMap(df)
  }

  test("every enumerated AppName maps to its content type, case-sensitively") {
    val expected = Map(
      "CHANNEL" -> "Truyen Hinh", "DSHD" -> "Truyen Hinh",
      "KPLUS" -> "Truyen Hinh", "KPlus" -> "Truyen Hinh",
      "VOD" -> "Phim Truyen", "FIMS_RES" -> "Phim Truyen",
      "BHD_RES" -> "Phim Truyen", "VOD_RES" -> "Phim Truyen",
      "FIMS" -> "Phim Truyen", "BHD" -> "Phim Truyen", "DANET" -> "Phim Truyen",
      "RELAX" -> "Giai Tri", "CHILD" -> "Thieu Nhi", "SPORT" -> "The Thao")
    // Contract carries the AppName so the mapping survives the projection
    val out = typed(expected.keys.toSeq.map(a => (a, a, 1L)): _*)
      .select("Contract", "Type").as[(String, String)].collect().toMap
    assert(out == expected)
  }

  test("unknown and case-mismatched AppNames are dropped as Error") {
    // 'Vod' and 'kplus' are NOT in the case-sensitive table
    val out = typed(("C1", "Vod", 1L), ("C1", "kplus", 1L), ("C1", "OTHER", 1L))
    assert(out.count() == 0)
  }

  test("sentinel contract '0' and NULL contracts are dropped (3VL)") {
    val df = Seq(
      (Some("0"), "VOD", 1L), (None: Option[String], "VOD", 2L), (Some("C9"), "VOD", 3L))
      .toDF("Contract", "AppName", "TotalDuration")
      .withColumn("log_date", org.apache.spark.sql.functions.current_date())
    val out = ContentTypeMap(df)
    assert(out.select("Contract").as[String].collect().toSeq == Seq("C9"))
  }
}
