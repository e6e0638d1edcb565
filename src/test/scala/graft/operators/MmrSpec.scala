package graft.operators

import graft.SparkSpec

/** MMR diversified retrieval: the distributed unrolled-superstep trace
  * must equal an INDEPENDENT sequential reference greedy over the same
  * candidate pool (collected once, replayed in plain Scala), and the
  * diversification must actually bite — on the near-dup-rich embedding
  * corpus, MMR's pick set diverges from the plain relevance top-K for
  * at least one query, trading relevance for lower redundancy. */
class MmrSpec extends SparkSpec {

  import MmrQueries.{MmrK, MmrQ}

  test("trace equals the sequential reference greedy; diversification bites") {
    val cand = MmrQueries.candFrame(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toArray))
    val got = MmrQueries.mmrSelect.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum

    var divergedSomewhere = false
    (0L until MmrQ).foreach { q =>
      val pool = cand.filter(_._1 == q)
      assert(pool.length == MmrQueries.MmrCand)
      // reference greedy, straight off the paper
      var selected = Vector.empty[(Long, Long, Long)] // (id, rel, red)
      (1 to MmrK).foreach { _ =>
        val remaining = pool.filterNot(c => selected.exists(_._1 == c._2))
        val scored = remaining.map { c =>
          val red =
            if (selected.isEmpty) 0L
            else selected.map(s =>
              dot(c._4, pool.find(_._2 == s._1).get._4)).max
          (c._2, c._3, red)
        }
        selected :+= scored.minBy(x => (-(x._2 - x._3), x._1))
      }
      val expected = selected.zipWithIndex.map { case ((id, rel, red), i) =>
        (q, i + 1L, id, rel, red)
      }
      val gotQ = got.filter(_._1 == q).sortBy(_._2).toVector
      assert(gotQ == expected, s"query $q: $gotQ != $expected")

      val topK = pool.sortBy(c => (-c._3, c._2)).take(MmrK).map(_._2).toSet
      if (gotQ.map(_._3).toSet != topK) divergedSomewhere = true
      // redundancy on later picks is bounded by what pure relevance
      // would have accepted (sanity: red is a real max, not garbage)
      gotQ.tail.foreach { p => assert(p._5 > 0, s"near-dup corpus: $p") }
      assert(gotQ.head._5 == 0, "first pick has no redundancy by definition")
    }
    assert(divergedSomewhere,
      "MMR never diverged from plain top-K — the corpus or λ make the " +
        "operator vacuous")
  }
}
