package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Direct unit coverage of the HOF vector primitives (the native
  * expression is separately proven bit-identical in CosineSimilaritySpec). */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
    (Array(2.0f, 0.0f), Array(2.0f, 0.0f))).toDF("a", "b")

  test("dot: exact on known values") {
    val r = df.select(dot(col("a"), col("b"))).as[Double].collect()
    assert(r(0) == 32.0 && r(1) == 0.0 && r(2) == 4.0)
  }

  test("norm and cosine: orthogonal -> 0, parallel -> 1, zero vector -> null") {
    val n = df.select(norm(col("a"))).as[Double].collect()
    assert(math.abs(n(0) - math.sqrt(14.0)) < 1e-15 && n(1) == 1.0 && n(2) == 2.0)
    val c = df.select(cosine(col("a"), col("b"))).as[Option[Double]].collect()
    assert(c(1).contains(0.0) && c(2).contains(1.0))
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(cosine(col("a"), col("b"))).as[Option[Double]].collect()
    assert(z.head.isEmpty)
  }
}
