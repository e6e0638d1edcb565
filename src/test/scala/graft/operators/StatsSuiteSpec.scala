package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** `q_stats_suite` (round-10 verdict item 3) replaced Spark's float
  * builtins with exact-integer moment sums + a deterministic double
  * DAG so the query hashes against the DuckDB oracle. This spec keeps
  * the BUILTIN surface covered: the derived scaled values must agree
  * with Spark's own stddev_samp / var_samp / corr / skewness to within
  * floor-boundary tolerance, and the exact order-statistic percentiles
  * must be real data values bracketing the distribution. */
class StatsSuiteSpec extends SparkSpec {

  test("exact-integer stats agree with Spark's float builtins") {
    val derived = ExtraQueries.statsSuite.run(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val builtin = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(
        stddev_samp(col("l_extendedprice")).as("sd_price"),
        var_samp(col("l_quantity")).as("var_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("qty_price_corr"),
        skewness(col("l_discount")).as("skew_disc"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(derived.keySet == builtin.keySet && derived.nonEmpty)
    derived.foreach { case (flag, d) =>
      val b = builtin(flag)
      // sd_price_cents = floor(stddev in cents); builtin is in dollars
      val sdBuiltinCents = b.getDouble(1) * 100
      assert(math.abs(d.getLong(2) - math.floor(sdBuiltinCents)) <= 1,
        s"$flag: sd_price_cents ${d.getLong(2)} vs builtin $sdBuiltinCents")
      val varBuiltinE4 = b.getDouble(2) * 10000
      assert(math.abs(d.getLong(3) - math.floor(varBuiltinE4)) <= 1,
        s"$flag: var_qty_e4 ${d.getLong(3)} vs builtin $varBuiltinE4")
      // corr is scale-invariant: cents vs dollars cancels
      val corrBuiltinPpm = b.getDouble(3) * 1e6
      assert(math.abs(d.getLong(4) - math.floor(corrBuiltinPpm)) <= 1,
        s"$flag: corr_ppm ${d.getLong(4)} vs builtin $corrBuiltinPpm")
      // skewness is scale-invariant too (×100 on every discount cancels)
      val skewBuiltinPpm = b.getDouble(4) * 1e6
      assert(math.abs(d.getLong(5) - math.floor(skewBuiltinPpm)) <= 1,
        s"$flag: skew_ppm ${d.getLong(5)} vs builtin $skewBuiltinPpm")
    }
  }

  test("order-statistic percentiles are exact data values at the right ranks") {
    val rows = ExtraQueries.statsSuite.run(spark, sf0001).collect()
    val byFlag = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), round(col("l_extendedprice") * 100, 0).cast("long").as("p"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      val sorted = byFlag(flag)
      val n = sorted.length
      assert(r.getLong(1) == n)
      val k50 = math.ceil(n * 0.5).toInt
      val k95 = math.ceil(n * 0.95).toInt
      assert(r.getLong(6) == sorted(k50 - 1), s"$flag p50")
      assert(r.getLong(7) == sorted(k95 - 1), s"$flag p95")
      assert(r.getLong(6) <= r.getLong(7))
    }
  }
}
