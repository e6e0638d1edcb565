package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The quality suite must pass on the shipped tables AND actually fire
  * on corrupted data — a validation layer that can't fail is not a
  * gate. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("the shipped tables pass every check") {
    val rows = DataQualityQueries.dataQuality.run(spark, sf0001).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getBoolean(2)),
      s"violations on shipped data: ${rows.filterNot(_.getBoolean(2)).toSeq}")
  }

  test("duplicate keys and broken references are counted, not masked") {
    // same check expressions over deliberately-broken frames
    val dup = Seq(1L, 2L, 2L, 3L).toDF("c_custkey")
    val nViol = dup
      .agg((count(lit(1)) - countDistinct(col("c_custkey"))).as("n"))
      .collect()(0).getLong(0)
    assert(nViol == 1L)

    val orders = Seq((10L, 1L), (11L, 2L), (12L, 99L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq(1L, 2L).toDF("o_custkey")
    val orphans = orders.select("o_custkey")
      .join(cust, Seq("o_custkey"), "left_anti").count()
    assert(orphans == 1L)
  }

  test("nullProfile reports per-column null counts in one pass") {
    val df = Seq((Some(1L), Some("a")), (None, Some("b")), (Some(3L), None))
      .toDF("k", "v")
    val r = DataQualityQueries.nullProfile(df).collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getLong(r.fieldIndex("nulls_k")) == 1L)
    assert(r.getLong(r.fieldIndex("nulls_v")) == 1L)
    // and on a real table: totals must line up with count()
    val ev = DataQualityQueries.nullProfile(Tables.events(spark, sf0001))
      .collect()(0)
    assert(ev.getLong(0) == Tables.events(spark, sf0001).count())
  }
}
