package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.plans.QSketch.{qSketch, qSketchM, qSketchMerge, qSketchN, qSketchQuantile}

/** The quantile-sketch algebra: merge-of-shards must equal the
  * whole-group sketch BYTE-FOR-BYTE, quantiles must be exact below
  * capacity (the sample IS the group) and rank-accurate above it,
  * everything repartition-invariant, and the degenerate empty sketch
  * must degrade (null quantile, zero counts) rather than crash. */
class QuantileSketchSpec extends SparkSpec {

  private def keyed = Tables.events(spark, sf0001)
    .filter(col("value").isNotNull)
    .select(col("event_type"), col("user_id"),
      col("event_id").cast("string").as("key"), col("value"))

  test("merge of shard sketches equals the whole-group sketch byte-for-byte") {
    val whole = keyed.groupBy("event_type")
      .agg(qSketch(col("key"), col("value"), 128).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val merged = keyed
      .groupBy(col("event_type"), (col("user_id") % 8).as("shard"))
      .agg(qSketch(col("key"), col("value"), 128).as("sk"))
      .groupBy("event_type").agg(qSketchMerge(col("sk")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(whole.keySet == merged.keySet)
    for ((t, sk) <- whole)
      assert(java.util.Arrays.equals(sk, merged(t)),
        s"$t: merged shard sketch differs from whole-group sketch")
  }

  test("below capacity the quantiles are exact selections over the group") {
    val rows = keyed.filter(col("user_id") < 3)
    val exact = rows.collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getDouble(3)).sorted }
    val got = rows.groupBy("event_type")
      .agg(qSketch(col("key"), col("value"), 100000).as("sk"))
      .select(col("event_type"),
        qSketchQuantile(col("sk"), lit(0.5)).as("p50"),
        qSketchQuantile(col("sk"), lit(0.0)).as("p0"),
        qSketchQuantile(col("sk"), lit(1.0)).as("p100"),
        qSketchN(col("sk")).as("n"), qSketchM(col("sk")).as("m"))
      .collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val vs = exact(r.getString(0))
      assert(r.getLong(4) == vs.length && r.getLong(5) == vs.length)
      assert(r.getDouble(1) == vs(math.floor(0.5 * (vs.length - 1)).toInt))
      assert(r.getDouble(2) == vs.head, "q=0 must be the minimum")
      assert(r.getDouble(3) == vs.last, "q=1 must be the maximum")
    }
  }

  test("above capacity the sample quantile lands within rank-error bands") {
    val exact = keyed.collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getDouble(3)).sorted }
    val got = keyed.groupBy("event_type")
      .agg(qSketch(col("key"), col("value"), 128).as("sk"))
      .select(col("event_type"),
        qSketchQuantile(col("sk"), lit(0.5)).as("p50"),
        qSketchN(col("sk")).as("n"), qSketchM(col("sk")).as("m"))
      .collect()
    for (r <- got) {
      val vs = exact(r.getString(0))
      assert(r.getLong(2) == vs.length, "n must count every row seen")
      assert(r.getLong(3) == 128L, "test premise: groups exceed capacity")
      // the sample p50's TRUE rank must sit near 0.5: binomial rank error
      // ~ sqrt(0.25/m) = 4.4% at m=128; allow 4 sigma
      val rank = vs.count(_ <= r.getDouble(1)).toDouble / vs.length
      assert(math.abs(rank - 0.5) < 0.18,
        s"${r.getString(0)}: sample p50 at true rank $rank")
    }
  }

  test("sketches are repartition-invariant") {
    val a = keyed.repartition(1).groupBy("event_type")
      .agg(qSketch(col("key"), col("value"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val b = keyed.repartition(13).groupBy("event_type")
      .agg(qSketch(col("key"), col("value"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((t, sk) <- a) assert(java.util.Arrays.equals(sk, b(t)))
  }

  test("degenerate all-null merge yields null quantile and zero counts") {
    import spark.implicits._
    val r = Seq((1, null.asInstanceOf[Array[Byte]])).toDF("g", "sk")
      .groupBy("g").agg(qSketchMerge(col("sk")).as("sk"))
      .select(qSketchQuantile(col("sk"), lit(0.5)).as("p50"),
        qSketchN(col("sk")).as("n"), qSketchM(col("sk")).as("m"))
      .collect()(0)
    assert(r.isNullAt(0), "quantile of an empty sketch must be null")
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("a duplicate key keeps the smaller value deterministically") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("a", 2.0), ("b", 7.0)).toDF("key", "value")
    val fwd = df.agg(qSketch(col("key"), col("value"), 8).as("sk"))
      .select(qSketchQuantile(col("sk"), lit(0.0)).as("lo"),
        qSketchM(col("sk")).as("m")).collect()(0)
    assert(fwd.getDouble(0) == 2.0 && fwd.getLong(1) == 2L)
    val rev = df.orderBy(desc("value"))
      .agg(qSketch(col("key"), col("value"), 8).as("sk"))
      .select(qSketchQuantile(col("sk"), lit(0.0)).as("lo")).collect()(0)
    assert(rev.getDouble(0) == 2.0, "order of arrival must not matter")
  }

  test("the functions are callable from SQL once registered") {
    // same registration paths GraftExtensions injects at session build time
    def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
        .value.asInstanceOf[Int]
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qsketch",
      exprs => QSketchAgg(exprs(0), exprs(1), lit(exprs(2))).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qsketch_quantile", exprs => QSketchQuantile(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qsketch_m", exprs => QSketchN(exprs(0), total = false), "built-in")
    keyed.createOrReplaceTempView("qs_events")
    val rows = spark.sql(
      """SELECT event_type,
        |  qsketch_quantile(qsketch(key, value, 32), CAST(0.5 AS DOUBLE)) AS p50,
        |  qsketch_m(qsketch(key, value, 32)) AS m
        |FROM qs_events GROUP BY event_type""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(r => !r.isNullAt(1) && r.getLong(2) == 32L))
  }
}
