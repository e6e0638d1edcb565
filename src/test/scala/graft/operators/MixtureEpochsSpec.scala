package graft.operators

import graft.SparkSpec

/** Epoch schedule over the adversarial corpus shape the upsampling rule
  * exists for: with one dominant crawl source, a one-corpus-equivalent
  * budget split by α = 3/4 shares must schedule the small high-quality
  * sources for MORE than one epoch (repeat passes + a deterministic
  * partial prefix) while the crawl runs a fraction of one — and the
  * schedule arithmetic must reconcile exactly. */
class MixtureEpochsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_epochs_spec"

  test("small sources upsample past one epoch; the crawl runs a fraction; " +
    "the schedule reconciles") {
    // crawl: 900 docs x 40 toks = 36000; books/wiki: 2 docs x 40 = 80 each
    def doc(i: Long, src: String) =
      (i, (1 to 40).map(j => s"t${i}_$j").mkString(" "), "en", src, 40L)
    val rows =
      (0L until 900L).map(doc(_, "crawl")) ++
      (900L until 902L).map(doc(_, "books")) ++
      (902L until 904L).map(doc(_, "wiki"))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = CorpusQueries.mixtureEpochs.run(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got.keySet == Set("crawl", "books", "wiki"))

    // crawl: zero full passes, a partial prefix, epochs < 1.000
    val (cAvail, cTarget, cFull, _, _, cDrawn, cMilli) = got("crawl")
    assert(cFull == 0L && cTarget < cAvail && cMilli < 1000L,
      s"crawl must run a fraction of one epoch: $got")

    // tiny sources: at least one full pass, epochs > 1.000
    Seq("books", "wiki").foreach { s =>
      val (avail, target, full, _, _, drawn, milli) = got(s)
      assert(full >= 1L && target > avail && milli > 1000L,
        s"$s must be upsampled past one epoch: ${got(s)}")
      assert(drawn >= avail, s"$s must include at least one full pass")
    }

    got.foreach { case (s, (avail, target, full, pDocs, pToks, drawn, milli)) =>
      // the schedule reconciles exactly
      assert(drawn == full * avail + pToks, s"$s: drawn mismatch")
      assert(milli == 1000L * drawn / avail, s"$s: epoch ratio mismatch")
      // the partial prefix never exceeds its remainder budget
      assert(pToks <= target % avail, s"$s: partial beyond remainder")
      assert(drawn <= target, s"$s: drew past its target")
      // 40-token docs: partial token mass is doc-granular
      assert(pToks == 40L * pDocs, s"$s: partial docs/tokens disagree")
    }

    // the grand total never exceeds the one-corpus-equivalent budget
    val availTotal = got.values.map(_._1).sum
    assert(got.values.map(_._6).sum <= availTotal)

    // flattening direction: crawl's drawn share < its corpus share
    assert(cDrawn.toDouble / got.values.map(_._6).sum <
      cAvail.toDouble / availTotal)

    // the MATERIALIZED drawn set reconciles with the aggregate contract
    // per source: sum(draws·dtoks) == drawn_tokens, and the extra-pass
    // doc count == partial_docs
    val draws = CorpusQueries.mixtureDraws.run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (s, (avail, _, full, pDocs, _, drawn, _)) =>
      val rows = draws.filter(_._1 == s)
      assert(rows.map(r => r._3 * r._4).sum == drawn,
        s"$s: materialized draw mass != drawn_tokens")
      assert(rows.count(_._3 == full + 1) == pDocs,
        s"$s: extra-pass doc count != partial_docs")
      if (full > 0)
        assert(rows.map(_._4).sum == avail,
          s"$s: a full pass must cover every doc exactly once")
    }
  }
}
