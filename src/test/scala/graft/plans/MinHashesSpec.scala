package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions._
import graft.plans.MinHashes.minhashes
import org.apache.spark.sql.functions._

/** The fused expression must equal the composed salted-md5-min form
  * value-for-value (same oracle), including null/empty handling. */
class MinHashesSpec extends SparkSpec {
  import spark.implicits._

  test("equals the composed arrayMinhash over the corpus, all seeds") {
    val sh = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
              array_distinct(wordShingles(tokens(col("text")), 3)).as("ss"))
    val both = sh.select(
      col("doc_id"),
      minhashes(col("ss"), 4).as("fused"),
      array((0 to 3).map(i => arrayMinhash(i, col("ss"))): _*).as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    assert(both.count() == 500)
  }

  test("empty shingle array yields null components; null input yields null") {
    val out = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, Some(Seq("a b c"))),
      (3L, Option.empty[Seq[String]]))
      .toDF("id", "ss")
      .select(col("id"), minhashes(col("ss"), 2).as("h"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(out(1L) == Seq(null, null))
    assert(out(2L).forall(h => h != null && h.length == 32))
    assert(out(3L) == null)
  }
}
