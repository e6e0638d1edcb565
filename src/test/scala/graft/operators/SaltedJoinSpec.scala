package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Salting.saltedJoin]] — the static answer to hot fact keys that
  * AqeSkewJoinSpec exercises dynamically. Pins both halves of the
  * contract: (1) the result is row-identical to the plain equi-join,
  * (2) the executed shuffle actually spreads the hot key across salt
  * lanes (composite join key, no broadcast when the dim is merge-hinted,
  * and no salt lane holding the whole hot key). */
class SaltedJoinSpec extends SparkSpec {

  private val nSalts = 8

  /** 90%-hot fact (key 0) joined to a 2000-row dim. */
  private def fixtures = {
    val fact = spark.range(100000).select(
      col("id").as("row_id"),
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 2000).as("k"),
      (col("id") % 97).as("v"))
    val dim = spark.range(2000).select(col("id").as("dk"), (col("id") * 3).as("dv"))
    (fact, dim)
  }

  test("salted join ≡ plain join under a 90%-hot key") {
    val (fact, dim) = fixtures
    val salted = Salting.saltedJoin(fact, "k", "row_id", dim, "dk", nSalts)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("dv").as("s"))
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("dv").as("s"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("merge-hinted salted join shuffles on (key, salt), not a broadcast") {
    val (fact, dim) = fixtures
    val joined = Salting.saltedJoin(fact, "k", "row_id", dim.hint("merge"), "dk", nSalts)
    joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim was broadcast — salting measured nothing:\n${plan.take(1500)}")
    assert(plan.contains("_fsalt") && plan.contains("_dsalt"),
      s"salt columns absent from the executed join keys:\n${plan.take(1500)}")
  }

  test("the hot key spreads across all salt lanes") {
    val (fact, _) = fixtures
    val lanes = fact.filter(col("k") === 0)
      .select(Salting.salt(col("row_id"), nSalts).as("lane"))
      .groupBy("lane").count().collect()
    assert(lanes.length == nSalts, s"expected $nSalts lanes, got ${lanes.length}")
    val counts = lanes.map(_.getLong(1))
    // deterministic pmod(row_id, 8) over a 90% stripe is near-uniform:
    // no lane may carry more than 2x its fair share
    assert(counts.max < 2.0 * counts.sum / nSalts)
  }
}
