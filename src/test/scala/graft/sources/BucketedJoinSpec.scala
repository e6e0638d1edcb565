package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioning both join sides on the key removes the
  * join's shuffle entirely — the co-located-join layout a recurring
  * 100 TB fact-to-fact join would be stored in. */
class BucketedJoinSpec extends SparkSpec {

  test("BucketedTableSink outputs join with zero Exchange in the plan") {
    // (tables land in the session's default spark-warehouse dir,
    // dropped in the finally block; dir is gitignored)
    // AQE can inject local shuffle readers that obscure the assertion
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sink = BucketedTableSink(8, Seq("l_orderkey"), Seq("l_orderkey"))
      sink.write(Tables.lineitem(spark, sf0001), "li_bucketed")
      sink.write(Tables.orders(spark, sf0001)
                   .withColumnRenamed("o_orderkey", "l_orderkey"),
                 "ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles on the key:\n$plan")

      // correctness unchanged vs the unbucketed join
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).count() == 0)
      assert(expected.exceptAll(joined).count() == 0)

      // the sink ANALYZEd the table: Catalyst sees real row counts and
      // key NDV, so size-based planning over the artifact is informed
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("li_bucketed"))
      val stats = meta.stats.getOrElse(fail("no table statistics recorded"))
      assert(stats.rowCount.exists(_.toLong > 0L))
      assert(stats.colStats.get("l_orderkey")
               .exists(_.distinctCount.exists(_.toLong > 0L)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
