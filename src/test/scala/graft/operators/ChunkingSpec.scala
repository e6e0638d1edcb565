package graft.operators

import graft.SparkSpec

/** Boundary semantics of the context-window chunker — pinned over a
  * hand-built documents table, since the driver corpus contains no
  * empty or exactly-boundary-length documents. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_chunking_spec"

  private def writeDocs(texts: Seq[String]): Unit =
    texts.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t, "en", "spec", t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def word(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunk geometry: starts every 48, 64-token windows, short tails") {
    writeDocs(Seq(
      "",              // doc 0: empty -> one empty chunk (split("") = [""])
      word(1),         // doc 1: one chunk of 1
      word(48),        // doc 2: one chunk (next start 48 == len, excluded)
      word(49),        // doc 3: two chunks — tail of 1 token at start 48
      word(64),        // doc 4: one full + 16-token tail at 48 (overlap)
      word(112),       // doc 5: 64 @ 0, 64 @ 48 (reaches 112), tail 16 @ 96
      word(97)))       // doc 6: 64 @ 0, 49 @ 48, 1 @ 96
    val rows = ChunkingQueries.chunkOverlap.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).toSeq.sorted).toMap
    assert(byDoc(0L) == Seq((0L, 1L))) // the single empty token
    assert(byDoc(1L) == Seq((0L, 1L)))
    assert(byDoc(2L) == Seq((0L, 48L)))
    assert(byDoc(3L) == Seq((0L, 49L), (48L, 1L)))
    assert(byDoc(4L) == Seq((0L, 64L), (48L, 16L)))
    assert(byDoc(5L) == Seq((0L, 64L), (48L, 64L), (96L, 16L)))
    assert(byDoc(6L) == Seq((0L, 64L), (48L, 49L), (96L, 1L)))
  }

  test("chunk text carries the exact token slice (coverage + overlap)") {
    writeDocs(Seq(word(112)))
    val byStart = ChunkingQueries.chunkOverlap.run(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(byStart(0L) == (1 to 64).map(i => s"w$i").mkString(" "))
    assert(byStart(48L) == (49 to 112).map(i => s"w$i").mkString(" "))
    assert(byStart(96L) == (97 to 112).map(i => s"w$i").mkString(" "))
    // every token appears in some chunk; overlap region appears twice
    assert(byStart(0L).endsWith("w64") && byStart(48L).startsWith("w49"))
  }

  test("bpe merge is greedy left-to-right non-overlapping") {
    import org.apache.spark.sql.functions._
    // wrap -> merge (a,b) -> unwrap, over the adversarial shapes
    val out = Seq("abab", "aaa", "bab", "ab", "a", "ba")
      .toDF("w")
      .select(col("w"), ChunkingQueries.bpeSymbols(
        ChunkingQueries.bpeApplyMerge(
          ChunkingQueries.bpeWrap(col("w")), lit("a"), lit("b"))).as("m"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("abab") == Seq("ab", "ab"), "back-to-back pairs both merge")
    assert(out("aaa") == Seq("a", "a", "a"), "no (a,b) occurrence -> untouched")
    assert(out("bab") == Seq("b", "ab"))
    assert(out("ab") == Seq("ab"))
    assert(out("a") == Seq("a"))
    assert(out("ba") == Seq("b", "a"))
    // greedy (a,a) on runs: leftmost pair wins, scan resumes after it
    val aa = Seq("aaa", "aaaa", "aaaaa").toDF("w")
      .select(col("w"), ChunkingQueries.bpeSymbols(
        ChunkingQueries.bpeApplyMerge(
          ChunkingQueries.bpeWrap(col("w")), lit("a"), lit("a"))).as("m"))
      .as[(String, Seq[String])].collect().toMap
    assert(aa("aaa") == Seq("aa", "a"))
    assert(aa("aaaa") == Seq("aa", "aa"))
    assert(aa("aaaaa") == Seq("aa", "aa", "a"))
  }

  test("bpe merge table: deterministic merges on a hand-built corpus") {
    // corpus: "low low low lower lowest"-style — classic BPE example
    writeDocs(Seq("low low low", "lower lower", "lowest"))
    val p = new org.apache.hadoop.fs.Path("/tmp/graft_catalog")
    sys.props("graft.catalog.rebuild") = "1"
    try {
      val merges = ChunkingQueries.bpeMergeTable(spark, dir)
        .orderBy("step")
        .select("step", "pair_a", "pair_b", "merged", "n")
        .as[(Long, String, String, String, Long)].collect()
      // the corpus EXHAUSTS after 6 merges (every word one symbol), so
      // later steps produce no merge row — the natural stop condition
      assert(merges.map(m => (m._1, m._4, m._5)).toSeq == Seq(
        (1L, "lo", 6L),     // "lo"/"ow" tie at 6 -> lexicographic lo
        (2L, "low", 6L),    // (lo, w)
        (3L, "lowe", 3L),   // (low, e): 3 beats (e, r): 2
        (4L, "lower", 2L),
        (5L, "lowes", 1L),  // (lowe,s)/(lowes,t)/... tie at 1 -> lex
        (6L, "lowest", 1L)))
      assert(merges(0)._2 == "l" && merges(0)._3 == "o")
      assert(merges(2)._2 == "low" && merges(2)._3 == "e",
        "merged symbols build on earlier merges (the iterated part)")
      // EXHAUSTION is survived by the sentinel guard: the final vocab
      // still holds every word, each fully merged to one token
      val vocab = ChunkingQueries.bpeVocab(spark, dir)
        .select("w", "wn", "pieces", "n_tokens")
        .as[(String, Long, Seq[String], Long)].collect()
        .map { case (w, wn, p, nt) => w -> ((wn, p, nt)) }.toMap
      assert(vocab.keySet == Set("low", "lower", "lowest"))
      assert(vocab.values.forall(_._3 == 1L),
        s"fully-merged words should be single tokens: $vocab")
      // the piece arrays (the encode surface) match: one piece = the word
      assert(vocab.forall { case (w, (_, p, _)) => p == Seq(w) },
        s"fully-merged piece array should be the word itself: $vocab")
      // and the tokenizer application reflects it: 6 words -> 6 tokens
      val tok = ChunkingQueries.bpeTokenize.run(spark, dir).collect()
      assert(tok.length == 1 && tok.head.getLong(1) == 6L &&
        tok.head.getLong(2) == 6L && tok.head.getLong(3) == 1000L)
    } finally sys.props.remove("graft.catalog.rebuild")
  }

  test("length buckets: integral bucketing and pad-to-longest accounting") {
    writeDocs(Seq(word(3), word(15), word(16), word(20), word(31)))
    // lengths 3,15 -> bucket 0 (max 15); 16,20,31 -> bucket 1 (max 31)
    val rows = ChunkingQueries.lengthBuckets.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(rows.toSeq == Seq(
      (0L, 2L, 18L, 15L, 15L * 2 - 18L),
      (1L, 3L, 67L, 31L, 31L * 3 - 67L)))
  }
}
