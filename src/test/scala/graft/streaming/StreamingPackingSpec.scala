package graft.streaming

import graft.SparkSpec
import graft.operators.ShardPacking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream/batch parity for incremental sequence packing: micro-batches
  * appending at the stored tail must equal ONE windowed packing of the
  * arrival-ordered concatenation (an independent single-window
  * reference, not the two-level implementation), sequences must
  * straddle batch boundaries with exact L-fill everywhere but the tail,
  * and replaying a batch must change nothing. */
class StreamingPackingSpec extends SparkSpec {
  import spark.implicits._

  private val stateD = "/tmp/graft_spack_state"
  private val L = 512L

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(stateD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def toksOf(ids: Range) =
    ids.map(i => (i.toLong, 37L + (i % 401))).toDF("doc_id", "toks")

  test("incremental packing equals the arrival-ordered windowed reference") {
    cleanup()
    PackingStreams.processBatch(toksOf(0 until 150), batchId = 0L, stateD)
    PackingStreams.processBatch(toksOf(150 until 260), batchId = 1L, stateD)
    PackingStreams.processBatch(toksOf(260 until 300), batchId = 2L, stateD)

    // independent reference: one cumsum window over (arrival batch,
    // bucket, doc_id), then per-doc span arithmetic
    val tagged =
      toksOf(0 until 150).withColumn("b", lit(0)) unionByName
      toksOf(150 until 260).withColumn("b", lit(1)) unionByName
      toksOf(260 until 300).withColumn("b", lit(2))
    val w = Window.orderBy(col("b"), ShardPacking.bucketOf(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = tagged
      .withColumn("cum_before", coalesce(sum("toks").over(w), lit(0L)))
      .select(col("doc_id"), col("toks"), col("cum_before"),
        explode(sequence(expr(s"cum_before div $L"),
          expr(s"(cum_before + toks - 1) div $L"))).as("seq"))
      .groupBy("seq")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(lit(L) * (col("seq") + 1), col("cum_before") + col("toks"))
          - greatest(lit(L) * col("seq"), col("cum_before"))).as("toks"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    val got = PackingStreams.sequences(spark, stateD)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed sequences diverge from the arrival-ordered reference")

    // loader contract across batch boundaries: exact fill but the tail
    val fills = got.orderBy("seq").select("toks").collect().map(_.getLong(0))
    fills.dropRight(1).foreach(t => assert(t == L))
    assert(fills.sum == (0 until 300).map(i => 37L + (i % 401)).sum)
  }

  test("replaying a batch reuses its recorded offset and changes nothing") {
    cleanup() // self-contained: rebuild the stream state directly
    PackingStreams.processBatch(toksOf(0 until 150), batchId = 0L, stateD)
    PackingStreams.processBatch(toksOf(150 until 260), batchId = 1L, stateD)
    PackingStreams.processBatch(toksOf(260 until 300), batchId = 2L, stateD)
    val before = PackingStreams.sequences(spark, stateD)
      .collect().map(_.toSeq).toSet
    PackingStreams.processBatch(toksOf(150 until 260), batchId = 1L, stateD)
    val after = PackingStreams.sequences(spark, stateD)
      .collect().map(_.toSeq).toSet
    assert(after == before, "replayed batch shifted the sequence stream")
  }

  test("a crash inside the offsets swap loses no state (ADVICE r9)") {
    cleanup()
    val fs = new org.apache.hadoop.fs.Path(stateD)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$stateD/$n")

    PackingStreams.processBatch(toksOf(0 until 150), batchId = 0L, stateD)
    PackingStreams.processBatch(toksOf(150 until 260), batchId = 1L, stateD)
    PackingStreams.processBatch(toksOf(260 until 300), batchId = 2L, stateD)
    val committed = PackingStreams.readOffsets(spark, stateD)
      .collect().map(_.toSeq).toSet
    val seqsBefore = PackingStreams.sequences(spark, stateD)
      .collect().map(_.toSeq).toSet

    // crash window 1: between rename-aside and rename-in — canonical
    // dir is GONE, newest committed state sits in offsets_next
    assert(fs.rename(p("offsets"), p("offsets_next")))
    assert(PackingStreams.readOffsets(spark, stateD)
      .collect().map(_.toSeq).toSet == committed,
      "readOffsets lost state when only offsets_next survived the crash")
    // the streaming engine replays the in-flight batch; it must find
    // its recorded offset (NOT restart at 0) and change nothing
    PackingStreams.processBatch(toksOf(260 until 300), batchId = 2L, stateD)
    assert(fs.exists(p("offsets")), "replay did not restore the canonical dir")
    assert(PackingStreams.sequences(spark, stateD)
      .collect().map(_.toSeq).toSet == seqsBefore,
      "post-crash replay shifted the sequence stream")

    // crash window 2: canonical renamed aside, next half-written (no
    // commit marker) — the prev fallback must serve, junk must not shadow
    assert(fs.rename(p("offsets"), p("offsets_prev")))
    fs.mkdirs(p("offsets_next"))
    fs.create(new org.apache.hadoop.fs.Path(p("offsets_next"), "part-junk"))
      .close()
    assert(PackingStreams.readOffsets(spark, stateD)
      .collect().map(_.toSeq).toSet == committed,
      "half-written offsets_next shadowed the committed prev state")
  }

  test("offsets state survives a committer with _SUCCESS markers disabled") {
    cleanup()
    PackingStreams.processBatch(toksOf(0 until 150), batchId = 0L, stateD)
    PackingStreams.processBatch(toksOf(150 until 260), batchId = 1L, stateD)
    val committed = PackingStreams.readOffsets(spark, stateD)
      .collect().map(_.toSeq).toSet
    assert(committed.nonEmpty)
    // a deployment disabling mapreduce success markers leaves no
    // _SUCCESS anywhere — our own _GRAFT_COMMIT must carry the state
    val fs = new org.apache.hadoop.fs.Path(stateD)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stateD/offsets/_SUCCESS"), false)
    assert(PackingStreams.readOffsets(spark, stateD)
      .collect().map(_.toSeq).toSet == committed,
      "state vanished without the committer's _SUCCESS marker")
  }
}
