package graft.pipeline

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** SURVEY §5.3: end-to-end golden tests on the reference's own sample
  * data (values pinned from an independent DuckDB computation over the
  * same files). Skipped cleanly if the reference data directory is
  * absent. */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sampleDir = "/root/reference/data/log_content_sample"
  private val searchDir = "/root/reference/data/log_search/20220701"
  private def present(p: String) = Files.exists(Paths.get(p))

  test("pipeline A reproduces the 30-day sample profile (golden facts)") {
    assume(present(sampleDir))
    val paths = Sources.dayRange("20220401", "20220430").map(d => s"$sampleDir/$d.json")
    val profile = InteractionPipeline.build(spark, paths).cache()

    assert(profile.count() == 2966) // distinct contracts after '0'/Error filters
    val totals = profile.agg(
      sum("Total_Phim_Truyen"), sum("Total_Thieu_Nhi"), sum("Total_Truyen_Hinh"),
      sum("Total_Giai_Tri"), sum("Total_The_Thao"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(totals == ((9339946L, 1167186L, 71858868L, 0L, 0L)))

    // one pinned contract, computed independently: film 23614, 2 active days
    val r = profile.filter($"Contract" === "BDH053175").collect().head
    assert(r.getAs[Long]("Total_Phim_Truyen") == 23614L)
    assert(r.getAs[Long]("Active") == 2L)
    assert(r.getAs[String]("Most Watched") == "Phim Truyen")
    assert(r.getAs[String]("Taste") == "Phim Truyen")
    assert(r.getAs[String]("Level_Activeness") == "Low")
    profile.unpersist()
  }

  test("day-range utility matches the reference's pandas.date_range semantics") {
    val r = Sources.dayRange("20220428", "20220502")
    assert(r == Seq("20220428", "20220429", "20220430", "20220501", "20220502"))
  }

  test("pipeline B over the surviving search day: deterministic, all Unchanged") {
    assume(present(searchDir))
    // same day plays both months: categories must match ⇒ everything Unchanged
    val out = BehaviorPipeline.build(spark, Seq(searchDir), Seq(searchDir)).cache()
    val n = out.count()
    assert(n > 0)
    assert(out.filter($"Trending_Type" =!= "Unchanged").count() == 0)
    assert(out.filter($"Category_Change" =!= "Unchanged").count() == 0)
    assert(out.filter($"most_search_T6" =!= $"most_search_T7").count() == 0)
    // distinct users with non-null user_id and keyword
    val users = Sources.searchLogs(spark, Seq(searchDir))
      .filter($"user_id".isNotNull).select("user_id").distinct().count()
    assert(n == users)
    out.unpersist()
  }

  test("classifier category distribution over the real search day (regression pin)") {
    assume(present(searchDir))
    // snapshot of RuleClassifier over 32,377 real Vietnamese keywords —
    // regenerate deliberately if the rule table changes
    val expected = Map(
      "Action" -> 19L, "Animation" -> 195L, "C Drama" -> 25L, "Comedy" -> 31L,
      "Drama" -> 695L, "Horror" -> 461L, "K Drama" -> 29L, "Music" -> 173L,
      "News" -> 34L, "Other" -> 29792L, "Reality Show" -> 233L,
      "Romance" -> 502L, "Sports" -> 55L, "TV Channel" -> 133L)
    val got = BehaviorPipeline.build(spark, Seq(searchDir), Seq(searchDir))
      .groupBy("category_T6").count()
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("the registered q_behavior_trend equals Pipeline B on the same log " +
       "(oracle surface ≡ reference-data surface)") {
    // round-7 verdict item 7: the oracle-checked composition and the
    // reference-format pipeline are two surfaces over ONE semantics.
    // Materialize the query's synthetic search log in the pipeline's
    // day-dir input format (H1 -> "June", H2 -> "July"), run both, and
    // pin identical output row sets.
    import graft.operators.ClassifyQueries
    val tmp = "/tmp/graft_behavior_parity"
    val p = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val log = ClassifyQueries.searchLog(spark, sf0001)
      .withColumn("half",
        when(dayofmonth(col("ts")) <= 15, "H1").otherwise("H2"))
      .select(col("user_id").cast("string").as("user_id"),
              col("keyword"), col("half"))
      .cache()
    try {
      log.filter($"half" === "H1").drop("half")
        .write.mode("overwrite").parquet(s"$tmp/20220601")
      log.filter($"half" === "H2").drop("half")
        .write.mode("overwrite").parquet(s"$tmp/20220701")
    } finally log.unpersist()
    val pipeline = BehaviorPipeline
      .build(spark, Seq(s"$tmp/20220601"), Seq(s"$tmp/20220701"))
      .select(col("user_id").cast("long").as("user_id"),
        col("most_search_T6").as("most_search_h1"),
        col("category_T6").as("category_h1"),
        col("most_search_T7").as("most_search_h2"),
        col("category_T7").as("category_h2"),
        col("Trending_Type").as("trending_type"),
        col("Category_Change").as("category_change"))
    val registered = graft.SparkEntry.queries("q_behavior_trend")(spark, sf0001)
    assert(registered.count() == pipeline.count())
    assert(registered.exceptAll(pipeline).count() == 0)
    assert(pipeline.exceptAll(registered).count() == 0)
    fs.delete(p, true)
  }

  test("userPlansMap array column: explode + plan:source split (map semantics)") {
    assume(present(searchDir))
    import org.apache.spark.sql.functions.{col, explode, split, count, lit}
    // each entry is "PlanName:source" — the implicit map the reference
    // never parses (SURVEY §1.4); explode + split covers the array/map
    // function surface on real data
    val plans = Sources.searchLogs(spark, Seq(searchDir))
      .select(explode(col("userPlansMap")).as("entry"))
      .select(
        split(col("entry"), ":").getItem(0).as("plan"),
        split(col("entry"), ":").getItem(1).as("src"))
    val bySrc = plans.groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.nonEmpty)
    assert(bySrc.keys.forall(s => s != null && s.nonEmpty)) // every entry splits
    assert(plans.count() == bySrc.values.sum)
  }

  test("multi-path read equals the reference's union-loop read (U1 ≡ S3)") {
    assume(present(sampleDir))
    val paths = Seq("20220401", "20220402", "20220403").map(d => s"$sampleDir/$d.json")
    val multi = Sources.interactionLogs(spark, paths)
    val looped = paths.map(p => Sources.interactionLogs(spark, Seq(p)))
      .reduce(_ unionByName _)
    assert(multi.count() == looped.count())
    assert(multi.exceptAll(looped).count() == 0)
  }
}
