package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Phrase semantics over positional postings: exact adjacency (not
  * mere co-occurrence), overlapping occurrences counted individually,
  * repeated-word phrases, and 3+-word chains. */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic positional postings from tiny docs, same shape as the
    * persisted index (term, doc_id, tf, positions). */
  private def postingsOf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))

  private def hits(docs: Seq[(Long, String)], words: String*): Map[Long, Long] =
    TextQueries.phraseHitsFrom(postingsOf(docs), words)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("adjacency, not co-occurrence") {
    val docs = Seq(
      1L -> "big data rocks",     // phrase present
      2L -> "data big rocks",     // both words, wrong order
      3L -> "big fat data")       // both words, not adjacent
    assert(hits(docs, "big", "data") == Map(1L -> 1L))
  }

  test("overlapping occurrences of a repeated-word phrase each count") {
    val docs = Seq(1L -> "go go go stop", 2L -> "go stop go")
    assert(hits(docs, "go", "go") == Map(1L -> 2L))
  }

  test("three-word chains require the full run") {
    val docs = Seq(
      1L -> "a b c d",     // abc at 0
      2L -> "a b x c",     // broken chain
      3L -> "x a b c a b c") // two full runs
    assert(hits(docs, "a", "b", "c") == Map(1L -> 1L, 3L -> 2L))
  }

  test("a phrase with an absent word matches nothing") {
    assert(hits(Seq(1L -> "a b c"), "a", "zzz").isEmpty)
  }

  private def near(docs: Seq[(Long, String)], w1: String, w2: String,
                   slop: Int): Map[Long, (Long, Long)] =
    TextQueries.nearHitsFrom(postingsOf(docs), w1, w2, slop)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("proximity counts pairs within slop in either order") {
    val docs = Seq(
      1L -> "big data rocks",      // adjacent: dist 1
      2L -> "data big rocks",      // reversed: dist 1 still counts
      3L -> "big x y z data",      // dist 4: outside slop 3
      4L -> "big x data big data") // pairs within 3: (0,2),(2,3)? — big@0,3 data@2,4
    assert(near(docs, "big", "data", 3) == Map(
      1L -> (1L, 1L), 2L -> (1L, 1L),
      // big@0-data@2 (2), big@3-data@2 (1), big@3-data@4 (1), big@0-data@4 is 4: out
      4L -> (3L, 1L)))
  }

  test("proximity with an absent term matches nothing") {
    assert(near(Seq(1L -> "a b c"), "a", "zzz", 5).isEmpty)
  }
}
