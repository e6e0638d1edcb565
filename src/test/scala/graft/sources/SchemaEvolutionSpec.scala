package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Reading a table whose schema grew across daily generations: old
  * files must null-fill the added column, both read strategies
  * (footer-merge vs declared superset schema) must agree, and filters
  * on the ORIGINAL columns must still push down to the scan. */
class SchemaEvolutionSpec extends SparkSpec {

  private val base = "/tmp/graft_schema_evo"

  private def writeGenerations(): Unit = {
    val o = Tables.orders(spark, sf0001)
    // day=1: original three columns
    o.select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$base/day=1")
    // day=2: the pipeline started emitting priority too
    o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$base/day=2")
  }

  test("merged read null-fills the added column for old generations") {
    writeGenerations()
    val df = Sources.readEvolved(spark, base)
    assert(df.columns.toSet ==
      Set("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority", "day"))
    val n = Tables.orders(spark, sf0001).count()
    assert(df.count() == 2 * n)
    assert(df.filter(col("day") === 1 && col("o_orderpriority").isNotNull).count() == 0)
    assert(df.filter(col("day") === 2 && col("o_orderpriority").isNull).count() == 0)
  }

  test("declared superset schema reads the same frame without footer merging") {
    writeGenerations()
    val merged = Sources.readEvolved(spark, base)
    val declared = Sources.readEvolved(spark, base,
      Some(merged.drop("day").schema)) // partition col comes back from the path
    assert(declared.columns.toSet == merged.columns.toSet)
    val a = merged.orderBy("day", "o_orderkey").collect()
    val b = declared.select(merged.columns.toIndexedSeq.map(col): _*)
      .orderBy("day", "o_orderkey").collect()
    assert(a.sameElements(b), "merge-schema and declared-schema reads differ")
  }

  test("filters on original columns still reach the evolved scan") {
    writeGenerations()
    val df = Sources.readEvolved(spark, base).filter(col("o_custkey") === 7)
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]"),
      s"pushdown lost on evolved read:\n$scan")
    // and partition pruning on the generation column still works
    val pruned = Sources.readEvolved(spark, base).filter(col("day") === 2)
    val leaves = pruned.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(!leaves.contains("day=1"), s"generation pruning failed:\n$leaves")
  }
}
