package graft.plans

import graft.{SparkSpec, Tables}
import graft.plans.Hll.{hllEstimate, hllMerge, hllSketch}
import org.apache.spark.sql.functions._

/** Pins the HLL sketch algebra the cross-shard cardinality workflow
  * depends on: merge-of-shards ≡ whole-corpus (exactly, byte for byte —
  * register-wise max is associative/commutative), partitioning
  * invariance, estimate accuracy, and SQL registration. */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = spark.range(n).select($"id".cast("string").as("v"))

  test("merging per-shard sketches equals the whole-corpus sketch") {
    val df = spark.range(100000)
      .select(($"id" % 4).as("shard"), ($"id" % 9173).cast("string").as("v"))
    // whole-corpus sketch in one aggregation
    val whole = df.agg(hllSketch($"v", 12).as("sk"))
      .select(hllEstimate($"sk").as("est"), $"sk")
      .collect().head
    // per-shard sketches (separate groups — in production, separate
    // JOBS writing sketch rows to a table), merged afterwards
    val merged = df.groupBy("shard").agg(hllSketch($"v", 12).as("sk"))
      .agg(hllMerge($"sk").as("sk"))
      .select(hllEstimate($"sk").as("est"), $"sk")
      .collect().head
    assert(merged.getLong(0) === whole.getLong(0))
    assert(merged.getAs[Array[Byte]](1).toSeq === whole.getAs[Array[Byte]](1).toSeq)
  }

  test("sketches are partitioning-invariant (deterministic hash, max-merge)") {
    val a = ids(50000).agg(hllEstimate(hllSketch($"v", 12))).collect().head.getLong(0)
    val b = ids(50000).repartition(13).agg(hllEstimate(hllSketch($"v", 12)))
      .collect().head.getLong(0)
    assert(a === b)
  }

  test("estimate tracks exact distinct within the p=12 error bound") {
    // standard error at p=12 is ~1.6%; allow 4 sigma
    for (n <- Seq(100, 5000, 80000)) {
      val est = ids(n).agg(hllEstimate(hllSketch($"v", 12))).collect().head.getLong(0)
      assert(math.abs(est - n).toDouble / n < 0.065, s"n=$n est=$est")
    }
    // small range: linear counting makes tiny cardinalities near-exact
    val tiny = ids(10).agg(hllEstimate(hllSketch($"v", 12))).collect().head.getLong(0)
    assert(tiny === 10L)
  }

  test("nulls are ignored and empty input yields estimate 0") {
    val withNulls = Seq(Some("a"), None, Some("b"), None, Some("a"))
      .toDF("v")
    val est = withNulls.agg(hllEstimate(hllSketch($"v", 12))).collect().head.getLong(0)
    assert(est === 2L)
    val empty = withNulls.filter($"v" === "zzz")
      .agg(hllEstimate(hllSketch($"v", 12))).collect().head.getLong(0)
    assert(empty === 0L)
  }

  test("sketch survives a parquet round-trip and merges in a later job") {
    // the actual cross-shard workflow: job 1 stores sketch rows; job 2
    // reads and merges them without touching raw data
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    Tables.documents(spark, sf0001)
      .groupBy("source").agg(hllSketch($"text", 12).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val later = spark.read.parquet(dir)
      .agg(hllEstimate(hllMerge($"sk"))).collect().head.getLong(0)
    val direct = Tables.documents(spark, sf0001)
      .agg(hllEstimate(hllSketch($"text", 12))).collect().head.getLong(0)
    assert(later === direct)
  }

  test("hll functions are callable from SQL once registered") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_sketch", exprs => HllSketchAgg(exprs(0),
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_merge", exprs => HllMergeAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_estimate", exprs => HllEstimate(exprs(0)), "built-in")
    spark.range(1000).createOrReplaceTempView("hll_probe")
    val est = spark.sql(
      "SELECT hll_estimate(hll_merge(sk)) FROM (" +
        "SELECT id % 7 AS g, hll_sketch(CAST(id AS STRING), 12) AS sk " +
        "FROM hll_probe GROUP BY 1)").collect().head.getLong(0)
    assert(math.abs(est - 1000) < 70)
  }

  test("mixed-precision merge is rejected, not silently wrong") {
    val df = ids(100)
    val s4 = df.agg(hllSketch($"v", 4).as("sk"))
    val s12 = df.agg(hllSketch($"v", 12).as("sk"))
    val ex = intercept[Exception] {
      s4.unionByName(s12).agg(hllMerge($"sk")).collect()
    }
    assert(ex.getMessage != null)
  }
}
