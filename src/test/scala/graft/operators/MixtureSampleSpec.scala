package graft.operators

import graft.SparkSpec

/** Temperature-mixture sampling over the adversarial corpus shape the
  * α-rule exists for: one crawl source dominating the token mass. The
  * α = 3/4 flattening must truncate the dominant source below its raw
  * token share while tiny sources saturate (keep everything) — tiny
  * meaning below ~M/256 of the dominant mass, the point where the
  * flattened share of the total/4 budget exceeds the source itself. */
class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_mixture_spec"

  test("dominant source truncated below raw share; tiny sources saturate") {
    // crawl: 900 docs x 40 toks = 36000 (99.56% of mass);
    // books/wiki: 2 docs x 40 = 80 toks each (< 36000/256 ~= 141)
    def doc(i: Long, src: String) =
      (i, (1 to 40).map(j => s"t${i}_$j").mkString(" "), "en", src, 40L)
    val rows =
      (0L until 900L).map(doc(_, "crawl")) ++
      (900L until 902L).map(doc(_, "books")) ++
      (902L until 904L).map(doc(_, "wiki"))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = CorpusQueries.mixtureSample.run(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap

    val (_, crawlToks, crawlTarget, crawlAvail, crawlSat) = got("crawl")
    assert(!crawlSat && crawlToks <= crawlTarget && crawlTarget < crawlAvail,
      s"crawl must be truncated: $crawlToks/$crawlTarget/$crawlAvail")

    // flattening: crawl's share of the SAMPLE < its share of the corpus
    val keptTotal = got.values.map(_._2).sum
    val availTotal = got.values.map(_._4).sum
    assert(crawlToks.toDouble / keptTotal < crawlAvail.toDouble / availTotal,
      s"crawl sampled share not flattened: $crawlToks/$keptTotal vs $crawlAvail/$availTotal")

    // tiny sources saturate: target exceeds available, everything kept
    Seq("books", "wiki").foreach { s =>
      val (n, toks, target, avail, sat) = got(s)
      assert(sat && target >= avail, s"$s should saturate: $target vs $avail")
      assert(n == 2 && toks == 80L, s"$s must keep everything: $n docs $toks toks")
    }

    // prefix gate: kept tokens never exceed the target, and never the
    // source itself — a saturated source keeps exactly its whole mass
    got.foreach { case (s, (_, toks, target, avail, sat)) =>
      assert(toks <= target, s"$s kept beyond its target: $toks vs $target")
      assert(toks <= avail, s"$s kept more than it has: $toks vs $avail")
      if (sat) assert(toks == avail, s"$s saturated but kept $toks of $avail")
    }
  }
}
