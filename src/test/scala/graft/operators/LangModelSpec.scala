package graft.operators

import graft.SparkSpec

/** Pinned semantics of the statistical LM family over hand-built corpora
  * (the driver corpus exercises the integer arithmetic end-to-end via the
  * DuckDB oracle; these pin the decision edges the corpus never hits). */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def tok(rows: (Long, String, Seq[String])*) =
    rows.flatMap { case (id, lang, ws) => ws.map(w => (id, lang, w)) }
      .toDF("doc_id", "lang", "w")

  test("voting classifier separates disjoint training vocabularies") {
    // train docs (id%5<4): lang aa speaks {x}, lang bb speaks {y}
    val t = tok(
      (0L, "aa", Seq("x", "x")),
      (1L, "bb", Seq("y", "y")),
      // held-out (id%5==4): one doc per side, tokens seen in training
      (4L, "aa", Seq("x")),
      (9L, "bb", Seq("y")))
    val got = LangModelQueries.confusionFrom(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("aa", "aa", 1L), ("bb", "bb", 1L)))
  }

  test("held-out tokens unseen in training abstain; all-unseen docs drop") {
    val t = tok(
      (0L, "aa", Seq("x")),
      (1L, "bb", Seq("y")),
      (4L, "aa", Seq("zz", "zz")), // only unseen tokens -> no ballots row
      (9L, "bb", Seq("y", "zz"))) // zz abstains, y still votes bb
    val got = LangModelQueries.confusionFrom(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("bb", "bb", 1L)))
  }

  test("equal-evidence token votes for the lexicographically first lang") {
    // x occurs once in each lang, totals equal -> weights tie -> 'aa' wins
    val t = tok(
      (0L, "aa", Seq("x")),
      (1L, "bb", Seq("x")),
      (4L, "bb", Seq("x")))
    val got = LangModelQueries.confusionFrom(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("bb", "aa", 1L)))
  }

  test("smoothing lets a minority-token lang outvote a sparse rival") {
    // w appears 3x under aa and 1x under bb, but bb's corpus is tiny:
    // weight_bb = (1+1)*S/(1+V) vs weight_aa = (3+1)*S/(9+V); with
    // V=2 distinct train tokens: bb -> 2/3 S, aa -> 4/11 S -> bb wins.
    val t = tok(
      (0L, "aa", Seq("w", "w", "w", "f", "f", "f", "f", "f", "f")),
      (1L, "bb", Seq("w")),
      (4L, "aa", Seq("w")))
    val got = LangModelQueries.confusionFrom(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("aa", "bb", 1L)))
  }

  test("bigram surprisal is zero for a deterministic-transition corpus") {
    // every occurrence of 'a' is followed by 'b': c(bigram)=c(first)=n
    val dir = "/tmp/graft_langmodel_spec"
    Seq((0L, "a b a b a b", "en", "spec", 11L),
        (1L, "a b", "en", "spec", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = LangModelQueries.lmBigram.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: bigrams ab,ba,ab,ba,ab ; c(a·)=c("a b")? a appears first in
    // "a b" 4x total, "b a" 2x; c1('a')=4? -> not all zero; assert exact:
    // corpus bigram counts: "a b": 4 (3 in doc0 + 1 in doc1), "b a": 2.
    // first-word counts: 'a': 4, 'b': 2 -> every surprisal bit-diff is 0.
    assert(rows.toSet == Set((0L, 5L, 0L, 0L), (1L, 1L, 0L, 0L)))
  }

  test("source divergence: identical sources score zero, skewed source > 0") {
    val dir = "/tmp/graft_langmodel_spec2"
    Seq((0L, "a b c d", "en", "s1", 7L),
        (1L, "a b c d", "en", "s2", 7L),
        (2L, "z z z z", "en", "s3", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = LangModelQueries.sourceDivergence.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val byS = rows.map(r => r._1 -> r._3).toMap
    assert(rows.map(_._1) == List("s1", "s2", "s3")) // ordered output
    assert(byS("s1") == byS("s2")) // identical distributions, equal drift
    assert(byS("s3") > byS("s1")) // the all-z source dominates
  }
}
