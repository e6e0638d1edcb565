package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Random-hyperplane LSH band keys for an `array<float>` embedding, in one
  * fused map-only pass: `planes` Rademacher (±1) hyperplanes grouped into
  * `planes / bandBits` bands; element b of the output is the integer
  * formed by the sign bits of band b (big-endian within the band).
  *
  * The hyperplanes are DETERMINISTIC — sign(p, i) = +1 iff the first hex
  * nibble of md5("p|i") is >= 8 — so an engine-independent oracle can
  * recompute the identical signature (the DuckDB side uses
  * `md5(p || '|' || i)[1] >= '8'`), and the projection accumulates
  * left-to-right in doubles, matching `list_sum` element order.
  *
  * Scale design (SURVEY §7.3 tier b, same pattern as [[MinHashes]]):
  * map-only and codegen'd, so the signature stage is embarrassingly
  * parallel; the downstream near-dup join is a (band, key) equi-join —
  * never a cross join. Pruning power tracks the similarity threshold:
  * at the near-dup regimes real pipelines use (cosine ≥ 0.8) a band
  * rejects almost all random pairs; at this corpus's outlier threshold
  * (0.45, barely above the random-pair cosine range) any sign-LSH family
  * prunes weakly — the parameters (planes, bandBits) are the dial.
  *
  * NULL contract: null input → null; sign patterns are cached per
  * (planes, dim) so per-row work is just the planes×dim multiply-adds.
  */
case class HyperplaneBands(child: Expression, planes: Int, bandBits: Int)
    extends UnaryExpression {

  require(planes % bandBits == 0, "planes must be a multiple of bandBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bands"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], planes, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.HyperplaneBands.compute($c, $planes, $bandBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {

  // sign patterns are pure functions of (planes, dim) — build once
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(planes: Int, dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((planes, dim), { case (p, d) =>
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(p) { plane =>
        Array.tabulate(d) { i =>
          md.reset()
          val digest = md.digest(s"$plane|$i".getBytes("UTF-8"))
          // first hex char >= '8'  ⟺  high nibble of byte 0 >= 8
          if (((digest(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
        }
      }
    })

  def compute(arr: ArrayData, planes: Int, bandBits: Int): ArrayData = {
    val dim = arr.numElements()
    val s = signs(planes, dim)
    val bits = new Array[Int](planes)
    var p = 0
    while (p < planes) {
      val sp = s(p)
      var dot = 0.0
      var i = 0
      while (i < dim) { // left-to-right, like the oracle's list_sum
        dot += arr.getFloat(i).toDouble * sp(i)
        i += 1
      }
      bits(p) = if (dot > 0) 1 else 0
      p += 1
    }
    val nBands = planes / bandBits
    val keys = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0
      var j = 0
      while (j < bandBits) { // big-endian within the band
        key = key * 2 + bits(b * bandBits + j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Column-API entry point. */
  def hyperplaneBands(c: Column, planes: Int, bandBits: Int): Column =
    GraftBridge.column(
      HyperplaneBands(GraftBridge.expression(c), planes, bandBits))
}
