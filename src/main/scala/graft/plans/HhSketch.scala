package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters (frequent-items) sketches — Misra-Gries
  * summaries with the Agarwal-et-al. mergeable-summaries combine rule.
  * The cross-shard frequent-tokens workflow a corpus build needs: each
  * shard job stores one ~k-entry sketch VALUE, a later rollup merges
  * them without re-reading raw data, exactly like the HLL/KMV tiers.
  *
  *  - [[HhSketchAgg]] (`hh_sketch(col, k)`): string stream → sketch of
  *    at most k counters (binary);
  *  - [[HhMergeAgg]]  (`hh_merge(sketch)`): sketches → merged sketch;
  *  - [[HhItems]]     (`hh_items(sketch)`): sketch → array of
  *    (token, cnt) structs, sorted (cnt DESC, token ASC);
  *  - [[HhTotal]]     (`hh_total(sketch)`): sketch → BIGINT total
  *    stream length n (the denominator of the error contract).
  *
  * THE ε·n CONTRACT (k counters, ε = 1/(k+1)), preserved by any merge
  * tree over any shard partitioning:
  *
  *   true(x) − n/(k+1)  ≤  cnt(x)  ≤  true(x)
  *
  * and every x with true(x) > n/(k+1) is IN the sketch (merge-of-shards
  * ⊇ true heavy hitters). Update: the classic decrement-all — each
  * decrement event retires k+1 stream counts (k counters + the incoming
  * item), so at most n/(k+1) decrements ever happen; amortized O(1) per
  * row. Merge: sum counters, subtract the (k+1)-th largest combined
  * count, drop non-positives — the Mergeable Summaries rule, under which
  * the per-shard undercounts ADD to at most (n_a + n_b)/(k+1).
  *
  * Below capacity (≤ k distinct values reach every buffer) nothing is
  * ever decremented and the sketch IS the exact count map — the regime
  * the registered query's oracle pins, mirroring the KMV tier's
  * "exact below capacity" property.
  *
  * Counter CONTENTS above capacity depend on stream order, which Spark
  * does not fix across partitionings — the guarantee holds for every
  * order (HhSketchSpec drives adversarial shardings), but byte-identity
  * does not, hence no DuckDB replay of the approximate regime. */
object Hh {

  final class Buffer(var k: Int) {
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var n: Long = 0L

    def insert(v: String): Unit = {
      n += 1
      val cur = counts.get(v)
      if (cur != null) counts.put(v, cur + 1L)
      else if (counts.size < k) counts.put(v, 1L)
      else {
        // decrement-all, dropping zeros: pays back k+1 earlier inserts
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }

    /** Shrink back to ≤ k counters after a merge: subtract the (k+1)-th
      * largest count from all, drop non-positives. */
    def prune(): Unit = {
      if (counts.size > k) {
        val values = new Array[Long](counts.size)
        var i = 0
        val vit = counts.values.iterator()
        while (vit.hasNext) { values(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(values)
        val cStar = values(values.length - k - 1) // (k+1)-th largest
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= cStar) it.remove()
          else e.setValue(e.getValue - cStar)
        }
      }
    }
  }

  /** Sum counters, add stream lengths, prune to k. A k == 0 buffer
    * (merge over zero inputs) is empty and compatible with any k. */
  def merge(a: Buffer, b: Buffer): Buffer = {
    require(a.k == 0 || b.k == 0 || a.k == b.k,
      s"cannot merge hh sketches with different k (${a.k} vs ${b.k})")
    if (a.k == 0) return b
    if (b.k == 0) return a
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.counts.get(e.getKey)
      a.counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    a.n += b.n
    a.prune()
    a
  }

  def serialize(b: Buffer): Array[Byte] = {
    var size = 4 + 8 + 4
    val entries = new Array[(Array[Byte], Long)](b.counts.size)
    var i = 0
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      entries(i) = (bytes, e.getValue)
      size += 4 + bytes.length + 8
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(b.k); bb.putLong(b.n); bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buffer(bb.getInt)
    b.n = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val s = new Array[Byte](len)
      bb.get(s)
      b.counts.put(new String(s, "UTF-8"), bb.getLong)
      i += 1
    }
    b
  }

  /** (token, cnt) structs sorted (cnt DESC, token ASC) — deterministic
    * rendering of whatever the sketch holds. Static: called from
    * generated code. */
  def items(bytes: Array[Byte]): ArrayData = {
    val b = deserialize(bytes)
    val arr = new Array[(String, Long)](b.counts.size)
    var i = 0
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue.longValue()); i += 1
    }
    val sorted = arr.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  def total(bytes: Array[Byte]): Long = deserialize(bytes).n

  val ItemsType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  /** Column API. */
  def hhSketch(c: Column, k: Int): Column =
    GraftBridge.column(
      HhSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())
  def hhMerge(c: Column): Column =
    GraftBridge.column(
      HhMergeAgg(GraftBridge.expression(c)).toAggregateExpression())
  def hhItems(c: Column): Column =
    GraftBridge.column(HhItems(GraftBridge.expression(c)))
  def hhTotal(c: Column): Column =
    GraftBridge.column(HhTotal(GraftBridge.expression(c)))
}

/** string stream → Misra-Gries sketch. Partial aggregation IS the shard
  * decomposition: map-side buffers stream their partition, the shuffle
  * carries ≤ k counters per group, reduce-side union applies the
  * mergeable-summaries rule. */
case class HhSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Hh.Buffer] with UnaryLike[Expression] {

  require(k >= 1, s"hh_sketch needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hh_sketch expects a string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Hh.Buffer = new Hh.Buffer(k)

  override def update(buffer: Hh.Buffer, input: InternalRow): Hh.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: Hh.Buffer, other: Hh.Buffer): Hh.Buffer =
    Hh.merge(buffer, other)

  override def eval(buffer: Hh.Buffer): Any = Hh.serialize(buffer)

  override def serialize(buffer: Hh.Buffer): Array[Byte] = Hh.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Hh.Buffer = Hh.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hh_sketch"

  override def withNewMutableAggBufferOffset(o: Int): HhSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HhSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HhSketchAgg =
    copy(child = c)
}

/** sketches → merged sketch (k adopted from the first non-empty input). */
case class HhMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Hh.Buffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hh_merge expects a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Hh.Buffer = new Hh.Buffer(0)

  override def update(buffer: Hh.Buffer, input: InternalRow): Hh.Buffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else Hh.merge(buffer, Hh.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: Hh.Buffer, other: Hh.Buffer): Hh.Buffer =
    Hh.merge(buffer, other)

  override def eval(buffer: Hh.Buffer): Any = Hh.serialize(buffer)

  override def serialize(buffer: Hh.Buffer): Array[Byte] = Hh.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Hh.Buffer = Hh.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hh_merge"

  override def withNewMutableAggBufferOffset(o: Int): HhMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HhMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HhMergeAgg =
    copy(child = c)
}

/** sketch → array<struct<token, cnt>> sorted (cnt DESC, token ASC) —
  * explode/inline to rows for reporting. */
case class HhItems(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hh_items expects a binary sketch column, got ${other.simpleString}")
  }

  override def dataType: DataType = Hh.ItemsType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hh_items"

  override def nullSafeEval(v: Any): Any = Hh.items(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hh.items($c)")

  override protected def withNewChildInternal(c: Expression): HhItems =
    copy(child = c)
}

/** sketch → BIGINT total stream length n (the ε·n denominator). */
case class HhTotal(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hh_total expects a binary sketch column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hh_total"

  override def nullSafeEval(v: Any): Any = Hh.total(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hh.total($c)")

  override protected def withNewChildInternal(c: Expression): HhTotal =
    copy(child = c)
}
