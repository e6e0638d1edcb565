package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked streaming dedup must emit each event_id exactly once. */
class StreamingDedupSpec extends SparkSpec {

  test("streamed dropDuplicates emits the batch-distinct set") {
    val stream = EventStreams.readEventStream(spark, sf0001)
    // duplicate the stream by unioning it with itself: every event twice
    val doubled = stream.union(stream)
    val q = EventStreams.dedupped(doubled)
      .select("event_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
      assert(streamed.count() == 1000)            // not 2000
      assert(streamed.distinct().count() == 1000) // each id once
    } finally q.stop()
  }
}
