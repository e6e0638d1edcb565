package graft

import graft.operators.CoreQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape assertions: the scale-critical physical properties
  * (pushdown, pruning, broadcast, partial aggregation) pinned as tests
  * so a regression in plan construction fails CI, not a 100 TB run. */
class PlanSpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def planString(df: DataFrame): String = {
    df.collect() // finalize AQE
    executed(df).toString + "\n" + df.queryExecution.executedPlan.toString
  }

  test("filter and column pruning reach the parquet scan (S2 pushdown)") {
    val df = CoreQueries.s2ScanPushdown.run(spark, sf0001)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45.0)]"),
      s"missing pushed filter in:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"scan reads more than the 3 projected columns:\n$scan")
  }

  test("star join broadcasts every dimension (no sort-merge on dims)") {
    val p = planString(CoreQueries.joinStar.run(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      s"dimension join fell back to sort-merge:\n$p")
  }

  test("flagship aggregation is a two-phase hash aggregate (partial+final)") {
    val p = planString(CoreQueries.q1Agg.run(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial aggregation:\n$p")
  }

  test("semi join plans as a real left-semi, not an inner+distinct") {
    val p = planString(CoreQueries.semiJoin.run(spark, sf0001))
    assert(p.contains("LeftSemi"), s"semi join not preserved:\n$p")
  }

  test("top-1-per-group plans as bounded WindowGroupLimit, not full-group sorts") {
    // Catalyst's InferWindowGroupLimit rewrites rank()<=k into a
    // per-group bounded pass on BOTH sides of the shuffle (partial +
    // final) — each partition keeps k rows per key instead of sorting
    // whole groups. At 100 TB this is the difference between a bounded
    // scan and a full per-group materialization; pin it so a refactor
    // of the filter shape can't silently lose the rewrite.
    val p = planString(CoreQueries.w1TopkPerGroup.run(spark, sf0001))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"rank<=1 filter lost the WindowGroupLimit rewrite:\n$p")
  }

  test("contamination join puts the benchmark side on the build side") {
    // the eval set is the bounded side by construction; the corpus side
    // must stream. A broadcast whose build side scans the full corpus
    // grams would be the round-2 OOM shape in new clothing.
    val df = graft.operators.CorpusQueries.contamination.run(spark, sf0001)
    val p = planString(df)
    // every BroadcastExchange in the plan must sit under an aggregation
    // that reduced to either the distinct benchmark grams or per-doc
    // counts — i.e. no broadcast directly over a raw corpus-wide scan
    val rawBroadcast = "BroadcastExchange[^\\n]*\\n[^\\n]*Scan parquet".r
    assert(rawBroadcast.findFirstIn(p).isEmpty,
      s"broadcast directly over a base-table scan:\n$p")
  }

  test("embedding near-dup is LSH-bucketed: no cross join on the unbounded table") {
    val df = graft.operators.DedupQueries.embeddingPairs.run(spark, sf0001)
    val p = planString(df)
    spark.catalog.clearCache() // the query caches the embeddings frame
    assert(!p.contains("CartesianProduct"), s"cross join in the scale path:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in the scale path:\n$p")
  }
}
