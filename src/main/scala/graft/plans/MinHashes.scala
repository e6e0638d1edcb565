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

  /** Banded variant used by [[MinHashBands]]: `bands` keys, each the
    * '|'-join of `rows` consecutive minhash components (the classic
    * banding construction — per-band collision probability J^rows).
    * Component seeds are the same 0..bands*rows-1 salts as
    * [[compute]](arr, bands*rows), so rows=1 emits byte-identical keys
    * to the unbanded form. */
  def computeBanded(arr: ArrayData, bands: Int, rows: Int): ArrayData = {
    val flat = compute(arr, bands * rows)
    if (rows == 1) return flat
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var nul = false
      val sb = new java.lang.StringBuilder(33 * rows)
      var r = 0
      while (r < rows && !nul) {
        val v = flat.getUTF8String(b * rows + r)
        if (v == null) nul = true
        else {
          if (r > 0) sb.append('|')
          sb.append(v.toString)
        }
        r += 1
      }
      out(b) = if (nul) null else UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point for the banded form. */
  def minhashBands(c: Column, bands: Int, rows: Int): Column =
    if (rows <= 1) minhashes(c, bands)
    else GraftBridge.column(MinHashBands(GraftBridge.expression(c), bands, rows))
}

/** Banded MinHash keys in one fused pass: `minhashBands(shingles, b, r)`
  * emits `b` band keys, each the '|'-join of `r` consecutive seed-salted
  * md5 minimums — widening the key drops per-band collision probability
  * from J to J^r, the corpus-size dial that keeps LSH bucket width flat
  * as near-dup density grows (round-12 verdict item 3; the embGeometry
  * discipline at the text tier). A fused expression for the same reason
  * as [[MinHashes]]: a composed `transform(sequence, b -> concat(slice))`
  * re-evaluates the full minhash child once PER BAND under the
  * interpreted higher-order path — 8× the md5 work. */
case class MinHashBands(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashes.computeBanded(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashes.computeBanded($c, $bands, $rows)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
