package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built from
  * Spark's higher-order functions (`transform`/`zip_with`/`aggregate`) so
  * they run inside codegen with no UDF boundary.
  *
  * All arithmetic is done in double precision with left-to-right
  * accumulation — the same order DuckDB's `list_dot_product` uses — so
  * results are bit-for-bit comparable with the oracle.
  */
object VectorFunctions {

  /** Cast an `array<float>` to `array<double>` (exact widening). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product with sequential double accumulation.
    * DuckDB: `list_dot_product(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))`. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; NULL when either norm is zero.
    * DuckDB: `list_cosine_similarity(...)` computes dot/(na*nb) the same
    * way, but the oracle queries spell it out with `list_dot_product` +
    * `sqrt` to pin the operation order. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na =!= 0.0 && nb =!= 0.0, dot(a, b) / (na * nb))
  }
}
