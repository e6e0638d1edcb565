package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-vs-quantity sweep: survivors grow monotonically with the
  * threshold, the terminal decile covers exactly the scored corpus, and
  * the terminal quality mass reconciles against the DSIR weights
  * artifact the sweep reads. */
class FilterSweepSpec extends SparkSpec {

  test("monotone growth; terminal decile covers the scored corpus and " +
    "reconciles the quality mass") {
    val rows = PipelineV2Queries.filterSweep.run(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10))

    rows.sliding(2).foreach { case Array(a, b) =>
      // >= not >: a corpus whose ppm spread is under 10 legitimately
      // repeats a threshold (the grid floors into [mn, mp])
      assert(b._2 >= a._2, s"thresholds must not decrease: $a -> $b")
      assert(b._3 >= a._3 && b._4 >= a._4,
        s"survivor counts must not shrink as the gate loosens: $a -> $b")
    }
    assert(rows.last._2 > rows.head._2,
      "the sf0.001 fixture's ppm spread should span a non-trivial grid")

    val kn = LangModelQueries.knScores(spark, sf0001)
    assert(rows.last._3 == kn.count(),
      "decile 10 must cover every scored document")
    assert(rows.last._4 ==
      kn.agg(sum(col("n_bigrams") + lit(1L))).head().getLong(0),
      "decile 10 token total != scored ws tokens")

    // terminal quality mass == the artifact's total over scored docs
    val wbTotal = kn.select("doc_id")
      .join(DsirQueries.weightsTable(spark, sf0001)
        .select(col("doc_id"), col("weight_bits")), Seq("doc_id"), "left")
      .agg(sum(coalesce(col("weight_bits"), lit(0L)))).head().getLong(0)
    assert(rows.last._5 == wbTotal,
      s"decile 10 quality mass ${rows.last._5} != artifact total $wbTotal")
  }
}
