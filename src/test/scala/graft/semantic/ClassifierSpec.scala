package graft.semantic

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SURVEY §5.5: classifier contract — closed vocabulary, fallback,
  * normalization, distributed application. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("all outputs stay inside the closed 14-category vocabulary") {
    val kws = Seq("VTV3", "running man", "bóng đá hôm nay", "nhạc trẻ",
      "doraemon", "phim ma", "love story", "hài tết", "phim hành động",
      "phim trung quốc", "phim hàn quốc", "thời sự", "xyzzy", "PHIM HAY", "")
    val out = kws.toDF("kw")
      .select(RuleClassifier.categorize(col("kw")).as("cat"))
      .as[String].collect()
    assert(out.forall(KeywordClassifier.Vocabulary.contains))
  }

  test("published heuristics: channels, reality, sports, fallback") {
    def c(k: String) = Seq(k).toDF("kw")
      .select(RuleClassifier.categorize(col("kw"))).as[String].collect().head
    assert(c("VTV3") == "TV Channel")
    assert(c("running man") == "Reality Show")
    assert(c("bóng đá") == "Sports")
    assert(c("no-rule-matches-this") == "Other")
    assert(c("PHIM TRUNG QUỐC") == "C Drama") // normalization: case-insensitive
  }

  test("null keywords fall back to Other") {
    val out = Seq(Option("phim"), None).toDF("kw")
      .select(RuleClassifier.categorize(col("kw"))).as[String].collect().toSeq
    assert(out == Seq("Drama", "Other"))
  }

  test("applyDistinct classifies via distinct+broadcast-join, keeping row count") {
    val df = Seq(("u1", "VTV3"), ("u2", "VTV3"), ("u3", "xyzzy"))
      .toDF("user_id", "most_search")
    val out = RuleClassifier.applyDistinct(spark, df, "most_search", "category")
    assert(out.count() == 3)
    val m = out.select("user_id", "category").as[(String, String)].collect().toMap
    assert(m == Map("u1" -> "TV Channel", "u2" -> "TV Channel", "u3" -> "Other"))
  }
}
