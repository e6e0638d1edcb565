package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions

/** The ensemble verdict must be exactly the precedence-fold of its three
  * gates: per document, the verdict is the FIRST firing gate in
  * exact > lexical > semantic order, recomputed here independently from
  * the exact hash grouping and the two persisted keep-list artifacts. */
class EnsembleVerdictSpec extends SparkSpec {

  test("verdict equals the precedence-fold of the three gates, per doc") {
    val got = DedupQueries.ensembleVerdict.run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), md5(TextFunctions.normalized(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val minPerHash = docs.groupBy(_._2).map { case (h, ds) =>
      h -> ds.map(_._1).min
    }
    val lexDrop = DedupQueries.lshKeepList(spark, sf0001)
      .filter(!col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val semDrop = DedupQueries.semKeepList(spark, sf0001)
      .filter(!col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet

    assert(got.size == docs.length, "one verdict per document")
    docs.foreach { case (id, h) =>
      val want =
        if (id != minPerHash(h)) "1_exact"
        else if (lexDrop(id)) "2_lexical"
        else if (semDrop(id)) "3_semantic"
        else "0_kept"
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // the corpus exercises the lexical and semantic gates
    assert(got.values.exists(_ == "2_lexical"))
    assert(got.values.exists(_ == "3_semantic"))
  }
}
