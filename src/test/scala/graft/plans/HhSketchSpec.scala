package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.plans.Hh.{hhItems, hhMerge, hhSketch, hhTotal}

/** The Misra-Gries heavy-hitters contract (k counters, ε = 1/(k+1)):
  * for ANY sharding and merge order,
  *   true(x) − n/(k+1) ≤ cnt(x) ≤ true(x),
  * every x with true(x) > n/(k+1) survives the merge-of-shards, and
  * below capacity the sketch is the exact count map. */
class HhSketchSpec extends SparkSpec {
  import spark.implicits._

  /** n = 20000: five heavy tokens (5000/4000/3000/2000/1500) + 4500
    * singletons; with k = 16, n/(k+1) = 1176 < 1500, so all five MUST
    * survive any merge tree. */
  private def stream = spark.range(20000).select(
    when(col("id") < 5000, "h1").when(col("id") < 9000, "h2")
      .when(col("id") < 12000, "h3").when(col("id") < 14000, "h4")
      .when(col("id") < 15500, "h5")
      .otherwise(concat(lit("noise-"), col("id"))).as("w"),
    col("id"))

  private val truth = Map(
    "h1" -> 5000L, "h2" -> 4000L, "h3" -> 3000L, "h4" -> 2000L, "h5" -> 1500L)

  private def check(shard: org.apache.spark.sql.Column): Unit = {
    val k = 16
    val sk = stream.groupBy(shard.as("s"))
      .agg(hhSketch(col("w"), k).as("sk"))
      .agg(hhMerge(col("sk")).as("sk"))
      .select(hhTotal(col("sk")).as("n"), hhItems(col("sk")).as("items"))
      .collect()(0)
    val n = sk.getLong(0)
    assert(n == 20000L, s"stream length $n")
    val eps = n / (k + 1)
    val items = sk.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items.size <= k)
    for ((t, tc) <- truth) {
      assert(items.contains(t), s"heavy hitter $t (true $tc) missing")
      val c = items(t)
      assert(c <= tc && c >= tc - eps, s"$t: cnt $c outside [${tc - eps}, $tc]")
    }
    // never an overcount, for anything reported
    for ((t, c) <- items)
      assert(c <= truth.getOrElse(t, 1L), s"$t overcounted: $c")
  }

  test("merge-of-shards keeps every true heavy hitter within eps*n (hash shards)") {
    check(col("id") % 7)
  }

  test("merge-of-shards keeps every true heavy hitter within eps*n (clustered shards)") {
    // contiguous chunks: each heavy token concentrated in few shards —
    // the opposite merge geometry of the hash sharding
    check(col("id") / 2857)
  }

  test("below capacity the sketch IS the exact count map") {
    val words = Tables.documents(spark, sf0001)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
    val exact = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size <= 64, "premise: vocabulary below capacity")
    val items = words
      .select(lit(1).as("g"), col("w"))
      .groupBy("g").agg(hhSketch(col("w"), 64).as("sk"))
      .select(explode(hhItems(col("sk"))).as("it"))
      .select(col("it.token"), col("it.cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items == exact)
  }

  test("degenerate all-null merge yields an empty sketch, not a crash") {
    val r = Seq((1, null.asInstanceOf[Array[Byte]])).toDF("g", "sk")
      .groupBy("g").agg(hhMerge(col("sk")).as("sk"))
      .select(hhTotal(col("sk")).as("n"), size(hhItems(col("sk"))).as("m"))
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getInt(1) == 0)
  }

  test("hh functions are callable from SQL once registered") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hh_sketch", exprs => HhSketchAgg(exprs(0),
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hh_items", exprs => HhItems(exprs(0)), "built-in")
    spark.range(100).selectExpr("CAST(id % 3 AS STRING) AS v")
      .createOrReplaceTempView("hh_probe")
    val top = spark.sql(
      """SELECT token, cnt
        |FROM (SELECT hh_items(hh_sketch(v, 8)) AS items FROM hh_probe)
        |LATERAL VIEW inline(items) t AS token, cnt
        |ORDER BY cnt DESC, token
        |""".stripMargin).collect()
    assert(top.length == 3 && top(0).getLong(1) == 34L)
  }
}
