package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.plans.Kmv.{kmvEstimate, kmvMerge, kmvSketch}

/** The KMV sketch algebra: merge-of-shards must equal the whole-corpus
  * sketch BYTE-FOR-BYTE (not just in estimate), estimates must be exact
  * below capacity and accurate above it, and everything must be
  * repartition-invariant. */
class KmvSketchSpec extends SparkSpec {

  private def keyed = Tables.events(spark, sf0001)
    .select(col("event_type"),
      col("user_id"),
      concat(col("user_id").cast("string"), lit("|"), col("props")).as("key"))

  test("merge of shard sketches equals the whole-group sketch byte-for-byte") {
    val whole = keyed.groupBy("event_type")
      .agg(kmvSketch(col("key"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val merged = keyed
      .groupBy(col("event_type"), (col("user_id") % 8).as("shard"))
      .agg(kmvSketch(col("key"), 64).as("sk"))
      .groupBy("event_type").agg(kmvMerge(col("sk")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(whole.keySet == merged.keySet)
    for ((t, sk) <- whole)
      assert(java.util.Arrays.equals(sk, merged(t)),
        s"$t: merged shard sketch differs from whole-group sketch")
  }

  test("below capacity the sketch IS the exact distinct set") {
    val got = keyed.filter(col("user_id") < 3)
      .groupBy("event_type")
      .agg(kmvSketch(col("key"), 10000).as("sk"),
        countDistinct(col("key")).as("exact"))
      .select(col("event_type"), kmvEstimate(col("sk")).as("est"), col("exact"))
      .collect()
    assert(got.nonEmpty)
    for (r <- got)
      assert(r.getLong(1) == r.getLong(2),
        s"${r.getString(0)}: sub-capacity estimate not exact")
  }

  test("above capacity the estimate lands within the expected error band") {
    val got = keyed.groupBy("event_type")
      .agg(kmvSketch(col("key"), 64).as("sk"),
        countDistinct(col("key")).as("exact"))
      .select(kmvEstimate(col("sk")).as("est"), col("exact"))
      .collect()
    for (r <- got) {
      val (est, exact) = (r.getLong(0), r.getLong(1))
      assert(exact > 64, "test premise: groups must exceed capacity")
      // rse ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
      assert(math.abs(est - exact).toDouble / exact < 0.51,
        s"estimate $est vs exact $exact out of band")
    }
  }

  test("sketches are repartition-invariant") {
    val a = keyed.repartition(1).groupBy("event_type")
      .agg(kmvSketch(col("key"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val b = keyed.repartition(13).groupBy("event_type")
      .agg(kmvSketch(col("key"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((t, sk) <- a) assert(java.util.Arrays.equals(sk, b(t)))
  }

  test("overlap algebra: self-overlap is identity, disjoint sets are zero") {
    val sk = keyed.groupBy("event_type").agg(Kmv.kmvSketch(col("key"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val a = sk("click")
    assert(Kmv.overlapJaccard(a, a) == 1.0)
    assert(Kmv.overlapIntersect(a, a) == Kmv.estimate(a))
    // keys are type-disjoint only if the same (user, props) never fires
    // both types — instead test true disjointness with salted copies
    val s1 = keyed.groupBy().agg(
      Kmv.kmvSketch(concat(lit("L|"), col("key")), 64).as("x"),
      Kmv.kmvSketch(concat(lit("R|"), col("key")), 64).as("y")).collect()(0)
    assert(Kmv.overlapJaccard(
      s1.getAs[Array[Byte]](0), s1.getAs[Array[Byte]](1)) == 0.0)
  }

  test("diff/union algebra: self, disjoint, and empty identities") {
    val sk = keyed.groupBy("event_type").agg(Kmv.kmvSketch(col("key"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val a = sk("click")
    assert(Kmv.overlapDiff(a, a) == 0L)
    assert(Kmv.overlapUnion(a, a) == Kmv.estimate(a))
    // truly disjoint salted copies: A \ B covers all of A's union share
    val s1 = keyed.groupBy().agg(
      Kmv.kmvSketch(concat(lit("L|"), col("key")), 64).as("x"),
      Kmv.kmvSketch(concat(lit("R|"), col("key")), 64).as("y")).collect()(0)
    val (l, r) = (s1.getAs[Array[Byte]](0), s1.getAs[Array[Byte]](1))
    val u = Kmv.overlapUnion(l, r)
    // disjoint: diff estimates partition the union estimate (up to the
    // two floors)
    val dSum = Kmv.overlapDiff(l, r) + Kmv.overlapDiff(r, l)
    assert(math.abs(dSum - u) <= 2, s"disjoint diffs $dSum vs union $u")
    // empty-sketch degenerates
    val empty = Kmv.serialize(new Kmv.Buffer(0))
    assert(Kmv.overlapDiff(empty, a) == 0L)
    assert(Kmv.overlapDiff(a, empty) == Kmv.estimate(a))
    assert(Kmv.overlapUnion(a, empty) == Kmv.estimate(a))
  }

  test("degenerate all-null merge yields an empty sketch, not a crash") {
    // kmv_merge over a group whose sketch inputs are all null serializes
    // a k=0 buffer; estimate must return 0 and overlap must treat it as
    // an empty set instead of failing require/NoSuchElementException.
    import spark.implicits._
    val empty = Seq((1, null.asInstanceOf[Array[Byte]])).toDF("g", "sk")
      .groupBy("g").agg(kmvMerge(col("sk")).as("sk"))
      .select(kmvEstimate(col("sk")))
      .collect()(0).getLong(0)
    assert(empty == 0L)
    val emptyBytes = Seq((1, null.asInstanceOf[Array[Byte]])).toDF("g", "sk")
      .groupBy("g").agg(kmvMerge(col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]](1)
    val real = keyed.groupBy().agg(kmvSketch(col("key"), 64).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(Kmv.overlapJaccard(emptyBytes, real) == 0.0)
    assert(Kmv.overlapIntersect(real, emptyBytes) == 0L)
    assert(Kmv.estimate(emptyBytes) == 0L)
  }

  test("duplicate values do not inflate the sketch") {
    val once = keyed.groupBy("event_type").agg(kmvSketch(col("key"), 64).as("sk"))
    val doubled = keyed.union(keyed).groupBy("event_type")
      .agg(kmvSketch(col("key"), 64).as("sk"))
    val x = once.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val y = doubled.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((t, sk) <- x) assert(java.util.Arrays.equals(sk, y(t)))
  }
}
