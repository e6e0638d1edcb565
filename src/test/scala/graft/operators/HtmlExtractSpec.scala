package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Block-level pins for the markup-extraction tier: each synthetic page
  * region must be judged by the DOCUMENTED rule (nav/footer by word
  * count, related-links by link density, mixed inline-link paragraphs
  * kept) — including the 1-word link-wrapped tail paragraph that is the
  * page builder's boundary case. */
class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private def blocks(docs: Seq[(Long, String, String)]) =
    HtmlQueries.blocksOf(
      docs.toDF("doc_id", "source", "text")
        .withColumn("w", graft.functions.TextFunctions.tokens(col("text"))))
      .select("doc_id", "bi", "txt", "lc", "tc", "wc", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap

  test("page regions are judged by word count and link density") {
    // 31 words: paragraphs (15, 15, 1); the tail paragraph is index 2 →
    // link-wrapped with an empty rest (the builder's boundary case)
    val words = (1 to 31).map(i => s"word$i").mkString(" ")
    val b = blocks(Seq((1L, "src0", words)))
    assert(b.count(_._1._1 == 1L) == 6, "expected 6 blocks (nav+3p+rel+footer)")
    // nav (bi 0) and footer (bi 5): 3 words each → dropped by word count
    assert(b((1L, 0))._1 == "Home About Contact" && !b((1L, 0))._5)
    assert(b((1L, 5))._1 == "archive terms site" && !b((1L, 5))._5)
    // plain paragraphs (bi 1, 2): 15 words, no links → kept
    assert(b((1L, 1))._2 == 0 && b((1L, 1))._4 == 15 && b((1L, 1))._5)
    assert(b((1L, 2))._2 == 0 && b((1L, 2))._4 == 15 && b((1L, 2))._5)
    // tail paragraph (bi 3): 1 link-wrapped word → dropped by word count
    assert(b((1L, 3))._1 == "word31 " && b((1L, 3))._4 == 1 && !b((1L, 3))._5)
    // related-links block (bi 4): 10 words but the 5 anchors are long
    // ("word1".."word5" = 25 link chars vs ~53 total) → density-dropped
    val (_, lc, tc, wc, kept) = b((1L, 4))
    assert(wc == 10 && lc == 25 && 10 * lc > 3 * tc && !kept,
      s"rel block should drop by density, got lc=$lc tc=$tc kept=$kept")
  }

  test("a mixed inline-link paragraph is kept (density is measured)") {
    // 45 words → 3 full paragraphs; index 2 wraps its first word only:
    // lc is one word of the 15 → far under the 0.3 density cut
    val words = (1 to 45).map(i => s"w$i").mkString(" ")
    val b = blocks(Seq((2L, "src0", words)))
    val (txt, lc, tc, _, kept) = b((2L, 3)) // paragraph index 2 at bi 3
    assert(lc == "w31".length && 10 * lc <= 3 * tc && kept,
      s"mixed paragraph must be kept, got lc=$lc tc=$tc kept=$kept '$txt'")
  }

  test("the density rule cuts both ways on the related-links block") {
    // single-char words → 5 anchor chars against ~33 total → KEPT;
    // ten-char words → 50 anchor chars against ~78 total → DROPPED
    val tiny = (1 to 15).map(_ => "a").mkString(" ")
    val long = (1 to 15).map(i => "abcdefghij").mkString(" ")
    val b = blocks(Seq((3L, "src0", tiny), (4L, "src0", long)))
    val relTiny = b((3L, 2)); val relLong = b((4L, 2))
    assert(relTiny._5, s"short-anchor rel block should pass density: $relTiny")
    assert(!relLong._5, s"long-anchor rel block should fail density: $relLong")
  }

  test("word accounting conserves: raw = nav + text + rel + footer") {
    val words = (1 to 31).map(i => s"word$i").mkString(" ")
    val b = blocks(Seq((1L, "src0", words)))
    val raw = b.collect { case ((1L, _), (_, _, _, wc, _)) => wc }.sum
    assert(raw == 3 + 31 + 10 + 3, s"words_raw $raw != 47")
  }
}
