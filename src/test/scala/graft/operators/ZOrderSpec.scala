package graft.operators

import graft.SparkSpec

/** Z-order layout: the Morton interleave is bit-exact on hand-computed
  * values; the layout partitions the corpus with valid per-file ranges;
  * and the audit shows the curve actually skipping — z-order scans
  * strictly fewer file-ranges than the insertion-order baseline under
  * identical min/max metadata semantics. */
class ZOrderSpec extends SparkSpec {

  test("Morton interleave matches hand-computed values") {
    val cases = Seq( // (d1, d2, z): d1 odd bits, d2 even bits
      (0L, 0L, 0L), (1L, 0L, 2L), (0L, 1L, 1L), (1L, 1L, 3L),
      (3L, 3L, 15L), (16L, 0L, 512L), (0L, 16L, 256L),
      (31L, 31L, 1023L), (5L, 2L, 38L)) // 5=101,2=010 -> 100110
    cases.foreach { case (a, b, want) =>
      val got = spark.sql(
        s"SELECT ${LayoutQueries.zExpr(a.toString, b.toString, "div")} AS z")
        .head().getLong(0)
      assert(got == want, s"z($a,$b) = $got, want $want")
    }
  }

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
}
