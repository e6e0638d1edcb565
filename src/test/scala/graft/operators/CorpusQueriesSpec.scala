package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Structural invariants for the corpus-construction family — the
  * DuckDB oracle pins exact values; these pin the properties that make
  * the answers MEANINGFUL (coverage, disjointness, stitching), which a
  * wrong-but-self-consistent implementation could fake past a hash. */
class CorpusQueriesSpec extends SparkSpec {

  test("contamination excludes the benchmark slice and flags consistently") {
    val rows = CorpusQueries.contamination.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id, nSh, nShared, flag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      assert(id % 97 != 0, s"benchmark doc $id leaked into the train side")
      assert(nShared <= nSh, s"doc $id shares more shingles than it has")
      assert((flag == 1) == (nShared > 0), s"doc $id flag/count mismatch")
    }
    // the synthetic corpus shares vocabulary — contamination must fire
    assert(rows.exists(_.getInt(3) == 1), "no contamination found at all")
  }

  test("repetition ratios are exact integer quotients in [0, 1]") {
    val rows = CorpusQueries.repetition.run(spark, sf0001).collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val (n, d, m) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d <= n && m <= n && m >= 1 && d >= 1)
      // ratios must be THE IEEE quotient of the integer columns —
      // bit-exact, the oracle-hash contract
      assert(r.getDouble(4) == (n - d).toDouble / n)
      assert(r.getDouble(5) == m.toDouble / n)
    }
  }

  test("split assignment partitions the corpus ~80/10/10") {
    val rows = CorpusQueries.splitAssign.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows.values.sum == 500)
    assert(rows("train") > rows("val") && rows("train") > rows("test"))
    // md5 gate: expected 80.1/11.3/8.6 — allow generous slack at n=500
    assert(rows("train") >= 350 && rows("train") <= 450)
  }

  test("shard packing covers each source with disjoint ordered shards") {
    val rows = CorpusQueries.packShards.run(spark, sf0001).collect()
    val bySource = rows.groupBy(_.getString(0))
    val maxDocToks = 99L
    var total = 0L
    for ((src, shards) <- bySource) {
      val sorted = shards.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq,
        s"$src: shard ids not contiguous from 0")
      // doc ranges are disjoint and ordered: shard boundaries in doc order
      for (Array(a, b) <- sorted.sliding(2))
        assert(a.getLong(5) < b.getLong(4), s"$src: overlapping shard ranges")
      // each non-final shard crosses the 2000-token budget only by the
      // straddling document; no shard is grossly over- or under-packed
      for (sh <- sorted.dropRight(1))
        assert(sh.getLong(3) > 2000 - maxDocToks && sh.getLong(3) < 2000 + maxDocToks,
          s"$src shard ${sh.getLong(1)}: ${sh.getLong(3)} tokens misses budget")
      total += sorted.map(_.getLong(2)).sum
    }
    assert(total == 500, s"packing lost documents: $total != 500")
  }

  test("PII scrub redacts exactly the planted identifiers") {
    val rows = CorpusQueries.piiScrub.run(spark, sf0001).collect()
    assert(rows.length == graft.Tables.customer(spark, sf0001).count())
    for (r <- rows) {
      assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 1,
        s"custkey ${r.getLong(0)}: expected one email/ip/phone each, got $r")
    }
    // scrubbed text is identical iff the planted PII digits collide —
    // custkey mod-cycles guarantee some reuse but not total collapse
    assert(rows.map(_.getString(4)).distinct.length > 1)
  }

  test("SCD2 intervals stitch exactly and have one open row per customer") {
    val rows = WarehouseQueries.scd2.run(spark, sf0001).collect()
    val byCust = rows.groupBy(_.getLong(0))
    for ((ck, rs) <- byCust) {
      def ts(r: Row, i: Int): java.time.LocalDateTime =
        r.getAs[java.time.LocalDateTime](i)
      // same-date changes produce zero-length intervals; order them the
      // way lead() did — (valid_from, valid_to) with the open row last
      val sorted = rs.sortBy(r => (ts(r, 2),
        if (r.isNullAt(3)) java.time.LocalDateTime.MAX else ts(r, 3)))(
        Ordering.Tuple2(Ordering.comparatorToOrdering(
            java.util.Comparator.naturalOrder[java.time.LocalDateTime]()),
          Ordering.comparatorToOrdering(
            java.util.Comparator.naturalOrder[java.time.LocalDateTime]())))
      assert(sorted.count(_.getInt(4) == 1) == 1, s"cust $ck: open-row count != 1")
      assert(sorted.last.isNullAt(3) && sorted.last.getInt(4) == 1,
        s"cust $ck: last interval must be the open one")
      for (Array(a, b) <- sorted.sliding(2)) {
        assert(ts(a, 3) == ts(b, 2),
          s"cust $ck: valid_to does not stitch to next valid_from")
        assert(a.getString(1) != b.getString(1),
          s"cust $ck: consecutive intervals with identical priority")
      }
    }
    // every customer with orders appears
    val nCust = graft.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(byCust.size == nCust)
  }
}
