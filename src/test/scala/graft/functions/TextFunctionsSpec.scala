package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Direct unit coverage of the text primitives (the oracle queries
  * exercise them end-to-end; these pin the edge semantics). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String) =
    Seq(input).toDF("text").select(c).collect().head

  test("tokens: whitespace runs collapse; leading/trailing trimmed") {
    val r = one(tokens(col("text")), "  a  b\tc \n d ")
    assert(r.getSeq[String](0) == Seq("a", "b", "c", "d"))
  }

  test("normalized: lowercase + single-spaced") {
    val r = one(normalized(col("text")), "  The  QUICK\t Fox ")
    assert(r.getString(0) == "the quick fox")
  }

  test("wordShingles: k-windows in order; shorter-than-k yields empty") {
    val w = split(lit("a b c d"), " ")
    val r3 = Seq(1).toDF("x").select(wordShingles(w, 3)).collect().head
    assert(r3.getSeq[String](0) == Seq("a b c", "b c d"))
    val short = Seq(1).toDF("x")
      .select(wordShingles(split(lit("a b"), " "), 3)).collect().head
    assert(short.getSeq[String](0).isEmpty)
  }

  test("fingerprint: order- and duplicate-insensitive, content-sensitive") {
    def fp(s: String) = one(fingerprint(tokens(col("text"))), s).getString(0)
    assert(fp("b a a c") == fp("c b a"))
    assert(fp("a b c") != fp("a b d"))
  }

  test("langId: stopword-dominant language wins; no hits -> 'und'") {
    def lid(s: String) = one(langId(tokens(col("text"))), s).getString(0)
    assert(lid("the cat is in the house and it is warm") == "en")
    assert(lid("el perro es un animal que vive en la casa") == "es")
    assert(lid("zzz qqq xxx") == "und")
  }
}
