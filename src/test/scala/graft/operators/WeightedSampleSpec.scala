package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

/** A-ES weighted sampling: agreement with a local brute-force reference
  * (same md5 → u → ln(u)/w keys computed in plain Scala), partitioning
  * invariance, and the weighting actually biasing selection. */
class WeightedSampleSpec extends SparkSpec {

  private def refKeys(d: String): Map[Long, Double] = {
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
    docs.flatMap { r =>
      val id = r.getLong(0)
      val w = r.getString(1).trim.split("\\s+").count(_.nonEmpty)
      if (w < 1) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"ws|$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
        Some(id -> math.log(u) / w)
      }
    }.toMap
  }

  test("selected set matches the brute-force A-ES reference") {
    val keys = refKeys(sf0001)
    val expect = keys.toSeq.sortBy { case (id, k) => (-k, id) }.take(20)
      .map(_._1).sorted
    val got = SampleQueries.weightedSample.run(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }

  test("selection is invariant under repartitioning and rerun") {
    val a = SampleQueries.weightedSample.run(spark, sf0001).collect().toSeq
    val b = SampleQueries.weightedSample.run(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  test("heavier rows are favored: inclusion rate grows with weight") {
    import spark.implicits._
    // 400 docs, weights 1 vs 9 (text of 1 vs 9 words); A-ES top-100
    // should include far more heavy docs than light ones
    val docs = (0 until 400).map { i =>
      val words = if (i % 2 == 0) 1 else 9
      (i.toLong, "src", Seq.fill(words)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val w = size(tokens(col("text")))
    val u = (conv(substring(md5(concat(lit("ws|"), col("doc_id").cast("string"))), 1, 8),
                  16, 10).cast("double") + 0.5) / 4294967296.0
    val top = docs
      .select(col("doc_id"), (log(u) / w).as("k"))
      .orderBy(col("k").desc, col("doc_id"))
      .limit(100)
      .collect().map(_.getLong(0))
    val heavy = top.count(_ % 2 == 1)
    assert(heavy > 75, s"heavy-doc share in top-100 was $heavy/100")
  }
}
