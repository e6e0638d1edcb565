package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The property z-ordering is FOR: after range-partitioning by the
  * Morton key, each file's (x, y) bounding box is tight, so a box
  * filter's footer-stats check (what Delta/Iceberg file skipping and
  * parquet row-group pruning both run) overlaps far fewer files than a
  * single-key layout — measured here directly on the written files. */
class ZOrderLayoutSpec extends SparkSpec {

  private val nFiles = 16

  /** Files whose per-file [min,max] box on (l_partkey, l_suppkey)
    * intersects the query box — the files a stats-pruned scan must read. */
  private def overlapping(path: String): (Long, Long) = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("xlo"), max("l_partkey").as("xhi"),
        min("l_suppkey").as("ylo"), max("l_suppkey").as("yhi"))
    val hit = stats.filter(
      col("xhi") >= 40 && col("xlo") <= 60 && col("yhi") >= 2 && col("ylo") <= 4)
    (stats.count(), hit.count())
  }

  test("z-order layout prunes a 2-D box query; single-key layout cannot") {
    val li = Tables.lineitem(spark, sf0001)
    val zPath = "/tmp/graft_zorder_layout"
    val naturalPath = "/tmp/graft_natural_layout"
    ZOrder.writeLayout(li, col("l_partkey"), col("l_suppkey"), 8, nFiles, zPath)
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(naturalPath)

    val (zTotal, zHit) = overlapping(zPath)
    val (nTotal, nHit) = overlapping(naturalPath)
    // range partitioner sampling may leave a boundary partition empty
    assert(zTotal >= nFiles - 2 && nTotal >= nFiles - 2)
    // orderkey layout leaves partkey/suppkey uncorrelated with files —
    // essentially every file's box covers the query box
    assert(nHit >= nFiles - 2, s"single-key layout unexpectedly pruned: $nHit")
    // z-order layout: the box query touches a small fraction of files
    assert(zHit * 2 <= nHit, s"z-order pruned too little: $zHit vs $nHit")
    // and nothing was lost: both layouts hold the same rows
    assert(spark.read.parquet(zPath).count() == li.count())
  }

  test("z-values preserve the interleave arithmetic (spot values)") {
    // (x=3, y=0) -> 0b0101 = 5; (x=0, y=3) -> 0b1010 = 10; (x=3, y=3) -> 15
    val df = spark.range(1).select(
      ZOrder.zValue(lit(3L), lit(0L), 8).as("a"),
      ZOrder.zValue(lit(0L), lit(3L), 8).as("b"),
      ZOrder.zValue(lit(3L), lit(3L), 8).as("c"),
      ZOrder.zValue(lit(255L), lit(255L), 8).as("d"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L && r.getLong(2) == 15L)
    assert(r.getLong(3) == 65535L)
  }

  test("integer-typed inputs do not wrap at bit positions >= 31") {
    // int literals, 3 dims x 16 bits -> top positions reach 47; without
    // the internal long cast, shiftleft would stay in 32-bit arithmetic
    // and wrap. The high bit of each input must land at b*n+i intact.
    val x = lit(1 << 15) // int with bit 15 set -> result bit 15*3+0 = 45
    val r = spark.range(1)
      .select(ZOrder.zValueN(Seq(x, lit(0), lit(0)), 16).as("z"))
      .collect()(0).getLong(0)
    assert(r == (1L << 45), s"expected ${1L << 45}, got $r")
  }

  test("files cover disjoint z-ranges (range partitioning held)") {
    val zPath = "/tmp/graft_zorder_ranges"
    ZOrder.writeLayout(Tables.lineitem(spark, sf0001),
      col("l_partkey"), col("l_suppkey"), 8, nFiles, zPath)
    val ranges = spark.read.parquet(zPath)
      .select(input_file_name().as("f"),
        ZOrder.zValue(col("l_partkey"), col("l_suppkey"), 8).as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    for (Array(a, b) <- ranges.sliding(2))
      assert(a._2 <= b._1, s"overlapping z-ranges: $a vs $b")
  }
}
