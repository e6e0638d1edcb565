package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WordPiece pins: the merge rule is LIKELIHOOD (count(ab)/(c_a·c_b)),
  * not raw frequency; inference is greedy longest-match-first (not BPE
  * merge replay); `##` rendering and the long-word fallback hold. */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def vmOf(pieces: String*) =
    pieces.toSeq.toDF("piece")
      .agg(map_from_entries(collect_list(struct(col("piece"), lit(1))))
        .as("vm"))

  private def seg(vm: org.apache.spark.sql.DataFrame, words: String*) =
    words.toSeq.toDF("w").crossJoin(vm)
      .select(col("w"),
        WordPieceQueries.greedySeg(col("w"), col("vm")).as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("inference is greedy longest-match-first, not merge replay") {
    val vm = vmOf("a", "b", "c", "ab", "bc", "abca")
    val got = seg(vm, "abc", "abca", "abcab", "cba")
    // longest prefix wins even when it strands a shorter tail ('ab'
    // beats the BPE-order-dependent 'a bc')
    assert(got("abc") == "ab ##c", got("abc"))
    // the whole word is the longest match of all
    assert(got("abca") == "abca", got("abca"))
    assert(got("abcab") == "abca ##b", got("abcab"))
    // no multi-char piece applies → character pieces
    assert(got("cba") == "c ##b ##a", got("cba"))
  }

  test("the merge rule maximizes likelihood, not frequency") {
    // 'xy' is the most FREQUENT pair (100) but x and y are everywhere
    // (score 100/(200·200)); 'qu' occurs 5 times and q/u occur ONLY
    // there (score 5/(5·5)) — WordPiece must merge (q, u) first, where
    // BPE's frequency rule would take (x, y).
    val st = Seq(("xy", 100L), ("xz", 100L), ("zy", 100L), ("qu", 5L))
      .toDF("w", "wn")
      .select(col("w"), col("wn"),
        ChunkingQueries.bpeWrap(col("w")).as("syms"))
    val best = WordPieceQueries.bestMerge(st)
      .select("pa", "pb").collect()(0)
    assert((best.getString(0), best.getString(1)) == ("q", "u"),
      s"likelihood rule picked ${(best.getString(0), best.getString(1))}")
    // and the frequency argmax over the same state is indeed (x, y)
    val byFreq = st
      .select(col("wn"), ChunkingQueries.bpeSymbols(col("syms")).as("a"))
      .select(col("wn"), expr("a[0]").as("pa"), expr("a[1]").as("pb"))
      .groupBy("pa", "pb").agg(sum("wn").as("n"))
      .orderBy(col("n").desc, col("pa"), col("pb")).limit(1).collect()(0)
    assert((byFreq.getString(0), byFreq.getString(1)) == ("x", "y"))
  }

  test("long words fall back to ##-rendered character pieces") {
    val w = "a" * (WordPieceQueries.MaxWordLen + 3)
    val got = Seq(w).toDF("w")
      .select(WordPieceQueries.charSegWp(col("w")).as("seg"))
      .collect()(0).getString(0)
    assert(got == ("a" + " ##a" * (WordPieceQueries.MaxWordLen + 2)), got)
  }
}
