package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Bloom filters as first-class sketch VALUES (the membership
  * twin of [[Hll]]): per-shard jobs build filters over their keys, a
  * later job ORs them together, and the merged filter broadcasts to
  * pre-filter a 100 TB scan — rows the filter rejects are DEFINITE
  * non-members and skip an expensive join entirely; possible-positives
  * fall through to the exact path, so composed results stay exact
  * (q_bloom_prefilter pins this end to end against a plain anti-join
  * oracle).
  *
  *  - `bloom_agg(key, bits, hashes)`: string keys → filter (binary;
  *    bits rounded up to a multiple of 64; layout = [bits:int]
  *    [hashes:int][words…] so a stored sketch is self-describing);
  *  - `bloom_merge(sketch)`: bitwise-OR merge — associative and
  *    commutative, so merge-of-shards ≡ whole-corpus byte-for-byte;
  *  - `bloom_contains(sketch, key)`: scalar membership probe
  *    (codegen'd), false → definitely absent, true → maybe present.
  *
  * Keys are StringType by contract (cast upstream): one hash kernel,
  * fully codegen-friendly, deterministic across engines and runs
  * (fixed-seed xxhash64 double hashing, Kirsch–Mitzenmacher). */
object Bloom {
  val Seed1 = 0x626c6d31L // "blm1"
  val Seed2 = 0x626c6d32L // "blm2"

  def numWords(bits: Int): Int = (bits + 63) / 64

  private def hash(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** Set the key's k bits in `words` (double hashing). */
  def add(words: Array[Long], bits: Int, k: Int, s: UTF8String): Unit = {
    val h1 = hash(s, Seed1)
    val h2 = hash(s, Seed2)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, bits).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Self-describing serialized form: [bits:int][k:int][words…]. */
  def serialize(words: Array[Long], bits: Int, k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(bits).putInt(k)
    words.foreach(bb.putLong)
    bb.array()
  }

  /** In-place OR of serialized sketch `b` into word buffer `a`. */
  def mergeInto(a: Array[Long], aBits: Int, aK: Int, b: Array[Byte]): Unit = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val bBits = bb.getInt; val bK = bb.getInt
    require(bBits == aBits && bK == aK,
      s"cannot merge bloom filters of different shapes " +
        s"(($aBits,$aK) vs ($bBits,$bK))")
    var i = 0
    while (i < a.length) { a(i) |= bb.getLong; i += 1 }
  }

  /** Membership probe on the serialized form (static — called from
    * generated code). False = definitely absent. */
  def containsUtf8(sketch: Array[Byte], s: UTF8String): Boolean = {
    // bloom_merge over a group with zero non-null inputs evals to an
    // empty byte array — an empty filter, so every probe is "absent".
    if (sketch.length < 8) return false
    val bb = java.nio.ByteBuffer.wrap(sketch)
    val bits = bb.getInt; val k = bb.getInt
    val h1 = hash(s, Seed1)
    val h2 = hash(s, Seed2)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, bits).toInt
      if ((bb.getLong(8 + (bit >>> 6) * 8) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Column API. */
  def bloomAgg(c: Column, bits: Int, hashes: Int): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(c), bits, hashes).toAggregateExpression())
  def bloomMerge(c: Column): Column =
    GraftBridge.column(
      BloomMergeAgg(GraftBridge.expression(c)).toAggregateExpression())
  def bloomContains(sketch: Column, key: Column): Column =
    GraftBridge.column(
      BloomContains(GraftBridge.expression(sketch), GraftBridge.expression(key)))
}

/** string keys → Bloom filter. Buffer = the raw word array; map-side
  * partial aggregation inserts locally and the shuffle carries one
  * filter per group, exactly like a real per-shard build. */
case class BloomAgg(
    child: Expression,
    bits: Int,
    hashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(bits >= 64 && bits <= (1 << 28), s"bloom bits out of range: $bits")
  require(hashes >= 1 && hashes <= 16, s"bloom hashes out of range: $hashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a string key column (cast upstream), got " +
        s"${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Bloom.numWords(bits))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buffer, bits, hashes, v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    Bloom.serialize(buffer, bits, hashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    Bloom.serialize(buffer, bits, hashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt; bb.getInt // header (shape is fixed by this instance)
    Array.fill((bytes.length - 8) / 8)(bb.getLong)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
}

/** Serialized sketches → merged sketch (bitwise OR). The buffer adopts
  * the first input's shape; merging different shapes is an error. */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_merge expects a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def mergeBytes(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      val bb = java.nio.ByteBuffer.wrap(buffer)
      val bits = bb.getInt; val k = bb.getInt
      val words = Array.fill((buffer.length - 8) / 8)(bb.getLong)
      Bloom.mergeInto(words, bits, k, other)
      Bloom.serialize(words, bits, k)
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else mergeBytes(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    mergeBytes(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_merge"

  override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomMergeAgg =
    copy(child = c)
}

/** (sketch, key) → boolean membership probe. Codegen'd via the static
  * [[Bloom.containsUtf8]] kernel — the expression sits in the hot
  * pre-filter path of a corpus scan, so it must not break whole-stage
  * codegen. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (binary sketch, string key), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(sk: Any, key: Any): Any =
    Bloom.containsUtf8(sk.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, key) => s"graft.plans.Bloom.containsUtf8($sk, $key)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomContains = copy(left = l, right = r)
}
