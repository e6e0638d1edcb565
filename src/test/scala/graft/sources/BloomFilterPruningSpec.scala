package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SURVEY round-3 list): for a
  * selective fact-dim join on a NON-partition column, Catalyst injects a
  * bloom filter built from the dim side and applies `might_contain` on
  * the fact side BEFORE the shuffle — the row-level sibling of dynamic
  * partition pruning, and the knob that keeps a 100 TB shuffle join from
  * shuffling rows the dim side will drop anyway. */
class BloomFilterPruningSpec extends SparkSpec {

  test("selective dim filter injects a bloom might_contain on the fact side") {
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // local fixtures are far below the production-size thresholds; drop
    // them so the rewrite fires at test scale
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // bloom pruning only applies to shuffle joins; stop the tiny dim from
    // broadcasting (where the filter would be pointless)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def query = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001).filter(col("o_totalprice") > 400000),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

      val withBloom = query
      val result = withBloom.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val opt = withBloom.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no bloom might_contain on the fact side:\n${opt.take(2000)}")
      assert(opt.contains("bloom_filter_agg"),
        s"no bloom filter built from the dim side:\n${opt.take(2000)}")

      // pruning must not change the answer
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = query.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(result == plain && plain.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
