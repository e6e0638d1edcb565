package graft.operators

import graft.SparkSpec
import graft.semantic.RuleClassifier
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior: empty frames and all-null columns must
  * flow through every operator without crashing or inventing rows. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyTyped = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("Contract", StringType), StructField("Type", StringType),
      StructField("TotalDuration", LongType), StructField("log_date", DateType))))

  test("engagement over an empty frame: zero rows, full schema") {
    val out = Engagement(emptyTyped)
    assert(out.count() == 0)
    assert(out.columns.contains("Most Watched") && out.columns.contains("Taste"))
  }

  test("top keyword over an empty frame: zero rows") {
    val empty = Seq.empty[(String, String)].toDF("user_id", "keyword")
    assert(TopKeyword(empty).count() == 0)
  }

  test("classifier applyDistinct over empty and all-null keyword frames") {
    val empty = Seq.empty[(String, String)].toDF("user_id", "most_search")
    assert(RuleClassifier.applyDistinct(spark, empty, "most_search", "category").count() == 0)
    val allNull = Seq(("u1", Option.empty[String]), ("u2", None))
      .toDF("user_id", "most_search")
    val out = RuleClassifier.applyDistinct(spark, allNull, "most_search", "category")
    assert(out.count() == 2)
    assert(out.select("category").as[String].collect().forall(_ == "Other"))
  }

  test("dedup resolve over zero pairs: empty result, no iteration blowup") {
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupResolve.keepList(noPairs).count() == 0)
  }

  test("trend with empty month frames: empty inner join") {
    val june = Seq.empty[(String, String, String)]
      .toDF("user_id", "most_search_T6", "category_T6")
    val july = Seq.empty[(String, String, String)]
      .toDF("user_id", "most_search_T7", "category_T7")
    assert(Trend(june, july).count() == 0)
  }
}
