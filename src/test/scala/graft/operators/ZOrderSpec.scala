package graft.operators

import graft.SparkSpec

/** Z-order layout: the Morton interleave is bit-exact on hand-computed
  * values; the layout partitions the corpus with valid per-file ranges;
  * and the audit shows the curve actually skipping — z-order scans
  * strictly fewer file-ranges than the insertion-order baseline under
  * identical min/max metadata semantics. */
class ZOrderSpec extends SparkSpec {
  // The Morton primitive itself (graft.plans.ZOrder) is value-pinned by
  // ZOrderLayoutSpec — this suite covers the layout/audit tier on top.

  test("layout partitions the corpus; ranges are valid and tight enough " +
    "to skip; the audit beats the linear baseline") {
    val layout = LayoutQueries.zorderLayout.run(spark, sf0001).collect()
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(layout.map(_.getLong(1)).sum == nDocs,
      "layout files do not partition the corpus")
    layout.foreach { r =>
      val (f, lo1, hi1, lo2, hi2) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(f >= 0 && f < 64 && lo1 >= 0 && hi1 <= 31 && lo1 <= hi1 &&
        lo2 >= 0 && hi2 <= 31 && lo2 <= hi2, s"invalid file stats: $r")
      // a coarse z-cell fixes the top 3 bits of each dimension: the
      // in-file range of either dim spans at most one low-bit octave
      assert(hi1 - lo1 <= 7 && hi2 - lo2 <= 7,
        s"z-cell $f spans more than its 3-bit prefix allows: $r")
    }

    val audit = LayoutQueries.zorderPrune.run(spark, sf0001).collect()
    assert(audit.nonEmpty)
    val (zSum, linSum) =
      (audit.map(_.getLong(2)).sum, audit.map(_.getLong(3)).sum)
    assert(zSum < linSum,
      s"z-order did not skip: $zSum vs linear $linSum")
    audit.foreach { r =>
      assert(r.getLong(2) >= 1, s"a source matched no z file: $r")
      assert(r.getLong(2) <= r.getLong(4) && r.getLong(3) <= r.getLong(5),
        s"scanned more files than exist: $r")
    }
  }

  test("Hilbert index is a bijection on the 32x32 grid with unit steps") {
    val grid = spark.range(1024).selectExpr(
      "id AS doc_id", "'s' AS source", "id div 32 AS d1", "id % 32 AS d2")
    val cells = LayoutQueries.hilbertCol(grid)
      .select("hd", "d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cells.map(_._1).distinct.length == 1024 &&
      cells.map(_._1).min == 0L && cells.map(_._1).max == 1023L,
      "Hilbert index is not a bijection onto 0..1023")
    val walk = cells.sortBy(_._1)
    walk.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"non-unit Hilbert step: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("curve comparison: both curves beat linear on span tightness; " +
    "Hilbert's seam locality is at least z-order's") {
    val rows = LayoutQueries.curveCompare.run(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set("hilbert", "linear", "zorder"))
    val (hb, ln, zo) = (rows("hilbert"), rows("linear"), rows("zorder"))
    // aligned power-of-two cells: the two curves induce the SAME box
    // partition, so span masses tie — the honest statement of why
    // Hilbert's edge is seam locality, not per-file ranges
    assert(hb._2 == zo._2 && hb._3 == zo._3,
      s"curve box partitions should coincide at aligned grain: $hb vs $zo")
    assert(hb._2 < ln._2 && hb._3 < ln._3,
      s"curves must bound dimensions tighter than insertion order: $rows")
    assert(hb._4 <= zo._4,
      s"Hilbert seam mass must not exceed z-order's: ${hb._4} vs ${zo._4}")
    assert(zo._4 < ln._4,
      s"curve order must sit closer in key space than insertion order: $rows")
  }
}
