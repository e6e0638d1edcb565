package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SURVEY §5.1: A4 pivot with missing types, C2 argmax tie priority,
  * C4 concat_ws null-skip, C5 banding, C10 fillna placement. */
class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def typedRows(rows: (String, String, Long, String)*) =
    rows.toDF("Contract", "Type", "TotalDuration", "d")
      .withColumn("log_date", to_date(col("d"), "yyyyMMdd")).drop("d")

  test("pivot with explicit values yields all five columns even when types are absent") {
    val out = Engagement.pivotDaily(typedRows(("C1", "Truyen Hinh", 10L, "20220401")))
    assert(out.columns.toSeq ==
      Seq("Contract", "Date", "Giai Tri", "Phim Truyen", "The Thao", "Thieu Nhi", "Truyen Hinh"))
    val r = out.collect().head
    // missing types filled to 0, not NULL (C10)
    assert(r.getAs[Long]("Giai Tri") == 0L && r.getAs[Long]("Truyen Hinh") == 10L)
  }

  test("most-watched tie resolves by priority Truyen Hinh > Phim Truyen > ... > The Thao") {
    val out = Engagement(typedRows(
      ("C1", "Phim Truyen", 5L, "20220401"), ("C1", "The Thao", 5L, "20220401"),
      ("C2", "Giai Tri", 7L, "20220402"), ("C2", "Thieu Nhi", 7L, "20220402")))
    val m = out.select("Contract", "Most Watched").as[(String, String)].collect().toMap
    assert(m("C1") == "Phim Truyen") // beats The Thao on tie
    assert(m("C2") == "Giai Tri")    // beats Thieu Nhi on tie
  }

  test("taste concatenates only nonzero types, fixed order, null-skipped") {
    val out = Engagement(typedRows(
      ("C1", "Truyen Hinh", 3L, "20220401"), ("C1", "Giai Tri", 2L, "20220401")))
    val taste = out.select("Taste").as[String].collect().head
    assert(taste == "Giai Tri-Truyen Hinh") // order: GT, PT, TT, TN, TH; zeros skipped
  }

  test("activeness bands: >20 High, 10..20 Medium, else Low on distinct days") {
    val manyDays = (1 to 25).map(i => ("CH", "Truyen Hinh", 1L, f"202204$i%02d"))
    val midDays = (1 to 10).map(i => ("CM", "Truyen Hinh", 1L, f"202204$i%02d"))
    val out = Engagement(typedRows(manyDays ++ midDays :+ (("CL", "Truyen Hinh", 1L, "20220401")): _*))
    val m = out.select("Contract", "Level_Activeness").as[(String, String)].collect().toMap
    assert(m == Map("CH" -> "High", "CM" -> "Medium", "CL" -> "Low"))
  }

  test("duplicate (contract, day, type) rows sum durations across the pivot") {
    val out = Engagement(typedRows(
      ("C1", "Truyen Hinh", 3L, "20220401"), ("C1", "Truyen Hinh", 4L, "20220402"),
      ("C1", "Truyen Hinh", 5L, "20220402")))
    val r = out.collect().head
    assert(r.getAs[Long]("Total_Truyen_Hinh") == 12L)
    assert(r.getAs[Long]("Active") == 2L)
  }
}
