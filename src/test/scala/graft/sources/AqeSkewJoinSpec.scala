package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime answer to hot keys that salting
  * (graft.operators.Salting) solves statically: with one key carrying
  * ~90% of the rows, AQE must split the oversized partition into
  * parallel sub-reads (`AQEShuffleRead skewed` feeding
  * `SortMergeJoin(skew=true)`) instead of letting a single straggler
  * task process it. Thresholds are production-sized, so the test dials
  * them down to fire at fixture scale. */
class AqeSkewJoinSpec extends SparkSpec {

  test("a 90%-hot key triggers the skewed-partition split, same answer") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    try {
      val left = spark.range(500000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 100, "x").as("payload"))
      val right = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      val row = joined.collect().head
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin(skew=true)"),
        s"hot key did not trigger the skew split:\n${p.take(2000)}")
      assert(p.contains("AQEShuffleRead skewed"),
        s"no skewed shuffle read in the plan:\n${p.take(2000)}")
      // exact expectation: hot key 0 matches right rv=0 450k times; the
      // 50k distinct keys >= 500000*... only ids 0..1999 with id%10==9
      // survive the right join (k < 2000 and k % 10 == 9 -> 200 keys)
      val singles = (0L until 2000L).filter(_ % 10 == 9)
      assert(row.getLong(0) == 450000L + singles.size)
      assert(row.getLong(1) == singles.map(_ * 2).sum) // hot key adds rv=0
    } finally {
      Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize").foreach(spark.conf.unset)
    }
  }
}
