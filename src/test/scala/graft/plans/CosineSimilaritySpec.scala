package graft.plans

import graft.SparkSpec
import graft.Tables
import graft.functions.VectorFunctions
import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The native expression must be bit-identical to the higher-order
  * function composition, across codegen and interpreted paths. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the HOF cosine over all sf0.001 embedding pairs") {
    val v = Tables.embeddings(spark, sf0001).limit(100)
    val a = v.select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = v.select($"vec_id".as("ib"), $"embedding".as("eb"))
    val both = a.crossJoin(b)
      .select(
        cosineSim($"ea", $"eb").as("native"),
        VectorFunctions.cosine($"ea", $"eb").as("hof"))
    val diffs = both.filter(
      ($"native".isNull =!= $"hof".isNull) ||
      ($"native".isNotNull && $"native" =!= $"hof")).count()
    assert(diffs == 0)
  }

  test("null input -> null; zero vector -> null; self-similarity ~ 1") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 2.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f, 2.0f))))
      .toDF("a", "b")
    val out = df.select(cosineSim($"a", $"b")).as[Option[Double]].collect()
    assert(math.abs(out(0).get - 1.0) < 1e-12)
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("native expressions are callable from SQL once registered") {
    // same registration paths GraftExtensions injects at session build time
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhashes", exprs => MinHashes(exprs(0),
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_bands", exprs => HyperplaneBands(exprs(0),
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int],
        exprs(2).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]), "built-in")
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))").collect().head.getDouble(0)
    assert(r == 0.0)
    val mh = spark.sql("SELECT minhashes(array('a b', 'b c'), 4)")
      .collect().head.getSeq[String](0)
    assert(mh.length == 4 && mh.forall(h => h != null && h.length == 32))
    val hb = spark.sql(
      "SELECT hyperplane_bands(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 16, 2)")
      .collect().head.getSeq[Int](0)
    assert(hb.length == 8 && hb.forall(k => k >= 0 && k < 4))
    assert(new GraftExtensions() != null) // extension class constructs cleanly
  }
}
