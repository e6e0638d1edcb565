package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles of a token array in one fused pass:
  * `word_shingles(words, k)[i] == concat_ws(' ', words[i..i+k-1])` —
  * byte-for-byte the values of the composed
  * `transform(sequence(...), i -> concat_ws(' ', slice(words, i, k)))`
  * form (null words skipped by the joiner, exactly like concat_ws;
  * shorter-than-k documents yield an empty array), so every DuckDB
  * shingle oracle is unchanged.
  *
  * Why an expression (SURVEY §7.3 tier b): the composed form runs a
  * `transform` lambda interpreted — ~20× slower — and shingling feeds
  * every hot text path (MinHash/LSH signatures, contamination grams,
  * repetition signals, the curation funnel). This is map-only, inside
  * whole-stage codegen, building each shingle with one byte-append loop.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  private val Space = ' '.toByte

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // materialize word bytes once; null words are skipped by the joiner
    // (concat_ws semantics)
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      var len = 0
      var j = s
      var m = 0 // non-null words in this shingle
      while (j < s + k) {
        if (words(j) != null) { len += words(j).length; m += 1 }
        j += 1
      }
      val bytes = new Array[Byte](len + math.max(0, m - 1))
      var pos = 0
      var first = true
      j = s
      while (j < s + k) {
        if (words(j) != null) {
          if (!first) { bytes(pos) = Space; pos += 1 }
          System.arraycopy(words(j), 0, bytes, pos, words(j).length)
          pos += words(j).length
          first = false
        }
        j += 1
      }
      out(s) = UTF8String.fromBytes(bytes)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def wordShingles(c: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), k))
}
