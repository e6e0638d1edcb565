package graft.functions

import graft.SparkSpec
import graft.operators.TopKeyword
import org.apache.spark.sql.functions._

/** The typed aggregator must agree with the window-function top-1 and
  * honor the tie contract. */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("top-1 via aggregator equals top-1 via window over random data") {
    val rng = new scala.util.Random(7)
    val logs = Seq.fill(300)((s"u${rng.nextInt(10)}", s"kw${rng.nextInt(12)}"))
      .toDF("user_id", "keyword")

    val viaWindow = TopKeyword(logs).as[(String, String)].collect().toMap

    val agg = TopKAggregator.topKByCount(1).toColumn
    val viaAgg = logs
      .groupBy("user_id", "keyword").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)]
      .map { case (u, k, n) => (u, (k, n)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .map { case (u, top) => (u, top.head._1) }
      .collect().toMap

    assert(viaAgg == viaWindow)
  }

  test("top-k keeps k entries, count-descending, key tie-break") {
    val logs = Seq("a", "a", "b", "b", "c").map(k => ("u", k))
      .toDF("user_id", "keyword")
    val agg = TopKAggregator.topKByCount(2).toColumn
    val top = logs
      .groupBy("user_id", "keyword").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)]
      .map { case (u, k, n) => (u, (k, n)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .collect().head._2
    assert(top == Seq(("a", 2L), ("b", 2L))) // tie a/b → alphabetical
  }
}
