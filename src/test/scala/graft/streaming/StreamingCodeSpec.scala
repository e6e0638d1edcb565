package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pack-on-arrival binary codes (streaming twin #20): out-of-order
  * replay reproduces the batch `idx_binary` artifact bit-for-bit; a
  * re-delivered batch never changes the code table; a NEW vector packs
  * against the FROZEN thresholds (never re-thresholds); an
  * uncommitted model is refused. */
class StreamingCodeSpec extends SparkSpec {

  private val modelD = "/tmp/graft_codestream_model"
  private val outD = "/tmp/graft_codestream_out"

  private def cleanup(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def codesMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** Model trained + corpus replayed once per suite run (lazy fixture —
    * each test runs green in isolation). */
  private lazy val seeded: CodeStreams.ThresholdModel = {
    cleanup(modelD); cleanup(outD)
    val m = CodeStreams.train(spark, sf0001, modelD)
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
    // out-of-order slices
    CodeStreams.packBatch(vecs.filter(col("vec_id") % 3 === 1), 0L, m, outD)
    CodeStreams.packBatch(vecs.filter(col("vec_id") % 3 === 2), 1L, m, outD)
    CodeStreams.packBatch(vecs.filter(col("vec_id") % 3 === 0), 2L, m, outD)
    m
  }

  test("out-of-order replay reproduces the batch code artifact " +
    "bit-for-bit; re-delivery is idempotent") {
    val m = seeded
    val got = codesMap(CodeStreams.codes(spark, outD))
    val want = codesMap(
      graft.operators.BinaryIndex.words(spark, sf0001)
        .select("vec_id", "w0", "w1"))
    assert(got == want, "streamed codes diverge from the batch artifact")

    // replay an old slice under a new batch id: newest-wins, same codes
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
    CodeStreams.packBatch(vecs.filter(col("vec_id") % 3 === 1), 3L, m, outD)
    assert(codesMap(CodeStreams.codes(spark, outD)) == want,
      "a replayed batch changed the code table")
  }

  test("a new arrival packs against the FROZEN thresholds") {
    val m = seeded
    val before = codesMap(CodeStreams.codes(spark, outD))
    // a vector far above every trained midrange threshold: every sign
    // bit must set — and had packBatch re-thresholded on the batch,
    // a single-vector batch would have min=max=x, threshold=x, and
    // x > x would clear every bit instead
    import spark.implicits._
    val late = Seq((990001L, Seq.fill(64)(1e9f)))
      .toDF("vec_id", "embedding")
    CodeStreams.packBatch(late, 4L, m, outD)
    val after = codesMap(CodeStreams.codes(spark, outD))
    assert(after(990001L) == ((0xFFFFFFFFL, 0xFFFFFFFFL)),
      s"frozen-threshold packing broke: ${after(990001L)}")
    assert(after.size == before.size + 1 &&
      before.forall { case (k, v) => after(k) == v },
      "a new arrival disturbed existing codes")
  }

  test("an uncommitted model is refused") {
    seeded
    val p = new org.apache.hadoop.fs.Path(s"$modelD/_CODE_MODEL_OK")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    val e = intercept[IllegalArgumentException] {
      CodeStreams.load(spark, modelD)
    }
    assert(e.getMessage.contains("_CODE_MODEL_OK"))
    // restore for other tests in this JVM
    fs.create(p, true).close()
  }
}
