package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions

/** The native shingle expression must be VALUE-IDENTICAL to the composed
  * transform/slice/concat_ws form it replaced — over the whole corpus
  * and on the edge shapes (short docs, k=1, empty strings). */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("native shingles equal the composed form over the full corpus") {
    for (k <- Seq(2, 3, 5)) {
      val diff = Tables.documents(spark, sf0001)
        .select(
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), k).as("a"),
          TextFunctions.wordShinglesComposed(TextFunctions.tokens(col("text")), k).as("b"))
        // null-safe inequality: a row where either side is NULL must COUNT
        // as a difference, not evaluate to NULL and slip through the filter
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(diff == 0, s"k=$k: native and composed shingles differ")
    }
  }

  test("edge shapes: shorter-than-k, exactly-k, k=1, empty tokens") {
    val df = Seq("a b", "a b c", "x", "").toDF("t")
    val got = df.select(
        TextFunctions.wordShingles(split(col("t"), " "), 3).as("s3"),
        TextFunctions.wordShingles(split(col("t"), " "), 1).as("s1"))
      .collect()
    assert(got(0).getSeq[String](0) == Seq())            // 2 words, k=3
    assert(got(1).getSeq[String](0) == Seq("a b c"))     // exactly k
    assert(got(0).getSeq[String](1) == Seq("a", "b"))    // k=1 = tokens
    assert(got(3).getSeq[String](1) == Seq(""))          // split("") = [""]
  }

  test("the expression is registered for SQL and stays in codegen") {
    // same registration path GraftExtensions injects at session build time
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0),
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]), "built-in")
    val r = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2) AS s").collect()(0)
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    // codegen-friendly: the shingle projection must not fall out of
    // WholeStageCodegen (the reason this expression exists)
    val plan = Tables.documents(spark, sf0001)
      .select(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; the shingle projection must carry it
    assert(plan.linesIterator.next().trim.startsWith("*(1) Project [word_shingles"),
      s"shingle projection fell out of codegen:\n$plan")
  }
}
