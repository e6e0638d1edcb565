package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash components of a shingle array in ONE fused pass:
  * `minhashes(shingles, k)[s] == min(md5(concat(s, '|', shingle)))` —
  * byte-for-byte the same value as the composed form (seed-salted md5,
  * lexicographic hex minimum), so the DuckDB oracles are unchanged.
  *
  * Why an expression (SURVEY §7.3 tier b): the composed forms either run
  * `transform` lambdas interpreted (20× slow) or explode + hash-agg
  * (extra shuffle). This is map-only — the 100 TB signature stage
  * becomes embarrassingly parallel — with one thread-local digest and
  * unsigned byte-array comparison (≡ hex-string order) per element.
  */
case class MinHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"minhashes"

  override def nullSafeEval(input: Any): Any =
    MinHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashes {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  // seed prefixes are constants per k — never rebuild them per row
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(
      k, kk => Array.tabulate(kk)(s => (s.toString + "|").getBytes("UTF-8")))

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic byte compare — identical ordering to the
    * lowercase-hex string compare the composed form performs. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Array[Byte]](k)
    val seedPrefix = prefixes(k)
    val md = digest.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(seedPrefix(s))
          md.update(bytes)
          val d = md.digest()
          if (mins(s) == null || less(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(d => if (d == null) null else toHex(d)): Array[Any])
  }

  /** Column-API entry point. */
  def minhashes(c: Column, k: Int): Column =
    GraftBridge.column(MinHashes(GraftBridge.expression(c), k))
}
