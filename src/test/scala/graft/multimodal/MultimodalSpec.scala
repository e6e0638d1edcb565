package graft.multimodal

import graft.{SparkSpec, Tables}
import graft.plans.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

/** Multimodal plumbing: decode metadata determinism and the
  * decode → embed → ANN pipeline shape. */
class MultimodalSpec extends SparkSpec {

  test("decode is deterministic and covers every row, distributed") {
    val payloads = Multimodal.withPayload(Tables.documents(spark, sf0001))
      .repartition(7) // ensure multiple partitions exercise the lifecycle
    val a = Multimodal.decodeAll(spark, payloads).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeAll(spark, payloads).collect().sortBy(_.doc_id)
    assert(a.length == 500 && a.sameElements(b))
    assert(a.forall(m => m.width >= 64 && m.height >= 64 && m.byte_len > 0))
  }

  test("decode -> embed -> cosine top-k runs end to end on binary payloads") {
    val payloads = Multimodal.withPayload(Tables.documents(spark, sf0001))
    val emb = Multimodal.embedAll(spark, payloads)
    assert(emb.count() == 500)
    // nearest neighbor of doc 0 among the rest, by native cosine
    val q = broadcast(emb.filter(col("doc_id") === 0)
      .select(col("embedding").as("eq")))
    val top = emb.filter(col("doc_id") =!= 0)
      .crossJoin(q)
      .withColumn("cos", cosineSim(col("embedding"), col("eq")))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(3)
      .collect()
    assert(top.length == 3)
    assert(top.forall(r => r.getAs[Double]("cos") > 0.5)) // all-positive vectors correlate
  }

  test("q_mm_verdict fold is internally consistent and non-vacuous") {
    import graft.operators.MultimodalQueries
    val rows = MultimodalQueries.mmVerdict.run(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (tk, ik, ak, vk, keep, by) = (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getString(6))
      assert(keep == (tk && ik && ak && vk),
        s"fold mismatch at ${r.getLong(0)}")
      // attribution = first failing gate, text > image > video > audio
      // (pixel-derived gates adjacent; audio last)
      val want = if (!tk) "text" else if (!ik) "image"
                 else if (!vk) "video" else if (!ak) "audio" else "kept"
      assert(by == want, s"attribution mismatch at ${r.getLong(0)}")
    }
    // non-vacuous: the corpus drops docs via the image, video AND
    // audio gates, and keeps at least one doc
    assert(rows.exists(_.getString(6) == "image"))
    assert(rows.exists(_.getString(6) == "video"))
    assert(rows.exists(_.getString(6) == "audio"))
    assert(rows.exists(_.getString(6) == "kept"))
  }
}
