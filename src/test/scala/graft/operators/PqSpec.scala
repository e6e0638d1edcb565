package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import SimilarityQueries.{ivfIters, ivfK, pqCodes, pqDsub, pqIters}

/** The IVF-PQ tier's contract: codes cover every (vector, subspace)
  * exactly once within bounds, the persisted artifact serves without
  * retraining, and ADC ranking tracks the exact residual-L2 ranking it
  * approximates (the quantization-only recall, separated from the
  * cosine-metric gap q_ann_ivfpq_recall measures end-to-end). */
class PqSpec extends SparkSpec {

  test("codes are total, unique per (vector, subspace), and in range") {
    val codes = PqIndex.codes(spark, sf0001, ivfK, ivfIters, pqDsub, pqCodes, pqIters)
    val m = 64 / pqDsub
    assert(codes.count() == 500L * m)
    assert(codes.groupBy("vec_id", "sub").count()
      .filter(col("count") =!= 1).count() == 0)
    assert(codes.filter(col("code") < 0 || col("code") >= pqCodes).count() == 0)
    val cb = PqIndex.codebooks(spark, sf0001, ivfK, ivfIters, pqDsub, pqCodes, pqIters)
    assert(cb.count() <= m.toLong * pqCodes * pqDsub)
    // every referenced (sub, code) has a complete dsub-dim codeword
    val widths = cb.groupBy("sub", "code").count()
      .filter(col("count") =!= pqDsub).count()
    assert(widths == 0, "incomplete codewords")
  }

  test("ADC top-5 tracks the exact residual-L2 top-5 (quantization-only recall)") {
    val asn = IvfIndex.assignments(spark, sf0001, ivfK, ivfIters)
    val res = PqQuantizer.residuals(spark, sf0001, ivfK, ivfIters, pqDsub).cache()
    try {
      val qcell = asn.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("cell"))
      val cand = broadcast(qcell)
        .join(asn.select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select("query_id", "neighbor_id")
      val qr = res.select(col("vec_id").as("query_id"), col("sub"),
        col("dim_in"), col("r").as("rq"))
      val cr = res.select(col("vec_id").as("neighbor_id"), col("sub"),
        col("dim_in"), col("r").as("rc"))
      val d2 = (col("rq") - col("rc")) * (col("rq") - col("rc"))
      val w = Window.partitionBy("query_id").orderBy(col("dist"), col("neighbor_id"))
      val exact = cand.join(qr, Seq("query_id")).join(cr, Seq("neighbor_id", "sub", "dim_in"))
        .groupBy("query_id", "neighbor_id").agg(sum(d2).as("dist"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
      val adc = SimilarityQueries.ivfPqTopK.run(spark, sf0001)
        .select(col("query_id"), col("neighbor_id").as("adc_neighbor"))
      val recall = exact.join(adc,
          exact("query_id") === adc("query_id") &&
            exact("neighbor_id") === adc("adc_neighbor"), "left")
        .groupBy(exact("query_id")).agg(count(col("adc_neighbor")).as("hits"))
        .agg(avg(col("hits").cast("double") / 5)).collect()(0).getDouble(0)
      // measured 0.44 at M=16/C=32 on this (near-random, PQ-adversarial)
      // corpus — deterministic, so the floor is stable
      assert(recall >= 0.4, s"quantization-only recall $recall below floor")
    } finally res.unpersist()
  }

  test("the recall gauge is deterministic and complete") {
    val a = SimilarityQueries.ivfPqRecall.run(spark, sf0001).collect()
    val b = SimilarityQueries.ivfPqRecall.run(spark, sf0001).collect()
    assert(a.length == 10 && a.toSeq == b.toSeq)
  }
}
