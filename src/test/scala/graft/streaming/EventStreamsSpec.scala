package graft.streaming

import graft.SparkSpec
import graft.operators.EventQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch/stream parity: the streaming transforms must produce exactly
  * the batch twins' results over the same data. */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed tumbling window equals the batch tumbling query (complete mode)") {
    val stream = EventStreams.readEventStream(spark, sf0001)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("window_start", "event_type", "n", "total")
      val batch = EventQueries.tumblingWindow.run(spark, sf0001)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally q.stop()
  }

  test("stateful sessionizer emits the batch sessionization (with flush sentinel)") {
    // batch truth (drop the per-user final session, which the stream only
    // closes on the flush sentinel below)
    val batch = EventQueries.sessionize.run(spark, sf0001)
      .select($"user_id", $"session_id".cast("long"), $"n_events",
              $"first_event", $"duration_ms")
      .as[EventStreams.Session]
      .collect().toSet

    val events = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", unix_millis($"ts").as("tsMs"))
      .as[EventStreams.UserEvent]
      .collect().sortBy(e => (e.tsMs, e.event_id))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.sessionize(mem.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_out").start()
    try {
      // feed in two chunks to exercise cross-batch state, then flush with
      // far-future sentinels that force every open session closed
      val (a, b) = events.splitAt(events.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val maxTs = events.map(_.tsMs).max
      val flush = events.map(_.user_id).distinct
        .map(u => EventStreams.UserEvent(u, Long.MaxValue, maxTs + 10L * 21600000L))
      mem.addData(flush.toIndexedSeq); q.processAllAvailable()

      val streamed = spark.table("sessions_out").as[EventStreams.Session]
        .collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
