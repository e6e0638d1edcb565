package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Log-structured keyed table: O(|batch|) delta appends, keep-latest
  * reads across generations (latest generation wins), pinned readers
  * untouched by compaction, replayed batches harmless at read level,
  * and the streaming sink's periodic compaction bounding read fan-in. */
class LogTableSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_logtable_spec"
  private def table = LogTable(dir, Seq("k"), "v")

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def snapshot(upTo: Option[Int] = None): Map[Long, String] =
    table.read(spark, upTo).select("k", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("delta appends merge keep-latest; later generations win") {
    cleanup()
    table.append(Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("k", "v", "payload"))
    table.append(Seq((2L, 2L, "b2"), (3L, 1L, "c1")).toDF("k", "v", "payload"))
    // same key, same version, different payload in a LATER generation:
    // the generation is the senior merge key, so the rewrite wins
    table.append(Seq((1L, 1L, "a1x")).toDF("k", "v", "payload"))
    assert(snapshot() == Map(1L -> "a1x", 2L -> "b2", 3L -> "c1"))
    // time travel: the view as of generation 2
    assert(snapshot(Some(2)) == Map(1L -> "a1", 2L -> "b2", 3L -> "c1"))
    cleanup()
  }

  test("changes() emits the effective CDC feed between generations") {
    cleanup()
    table.append(Seq((1L, 1L, "a1"), (2L, 1L, "b1"), (4L, 1L, "d1"))
      .toDF("k", "v", "payload"))
    // gen 2: update key 2's payload (version bump), insert key 3;
    // key 1 re-appended IDENTICALLY (same version+payload) -> unchanged
    table.append(Seq((1L, 1L, "a1"), (2L, 2L, "b2"), (3L, 1L, "c1"))
      .toDF("k", "v", "payload"))
    val feed = table.changes(spark, 1, 2)
      .select("k", "change_type", "old_payload", "new_payload")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).sortBy(_._1).toSeq
    // a log table never deletes (tombstones are upserts), so the feed
    // here is inserts + updates; key 1 and key 4 are unchanged and absent
    assert(feed == Seq(
      (2L, "update", Some("b1"), Some("b2")),
      (3L, "insert", None, Some("c1"))))
    // diffing a generation against itself is empty
    assert(table.changes(spark, 2, 2).isEmpty)
    cleanup()
  }

  test("compaction folds deltas; pinned readers and time travel survive") {
    cleanup()
    table.append(Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("k", "v", "payload"))
    table.append(Seq((1L, 2L, "a2")).toDF("k", "v", "payload"))
    val pinned = table.read(spark, Some(1))
    val pinnedRows = pinned.count()
    val folded = table.compact(spark)
    assert(folded.contains(3))
    // merged snapshot equals the pre-compaction view
    assert(snapshot() == Map(1L -> "a2", 2L -> "b1"))
    // the pinned generation-1 reader is untouched
    assert(pinned.count() == pinnedRows)
    assert(snapshot(Some(1)) == Map(1L -> "a1", 2L -> "b1"))
    // vacuum to the folded snapshot only; reads still correct
    GenerationedTable.vacuum(spark, dir, keep = 1)
    assert(snapshot() == Map(1L -> "a2", 2L -> "b1"))
    // nothing left to fold
    assert(table.compact(spark).isEmpty)
    cleanup()
  }

  test("a replayed batch is harmless at read level") {
    cleanup()
    val batch = Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("k", "v", "payload")
    table.append(batch)
    table.append(Seq((1L, 2L, "a2")).toDF("k", "v", "payload"))
    val before = snapshot()
    table.append(batch) // restart re-applies an old batch as a new delta
    assert(snapshot() == before,
      "replayed delta changed the keep-latest view")
    cleanup()
  }

  test("streaming sink appends deltas and compacts on schedule") {
    cleanup()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val q = table.sink(
      mem.toDF().toDF("k", "v", "payload"), compactEvery = 2).start()
    try {
      mem.addData(Seq((1L, 1L, "a1"), (2L, 1L, "b1"))); q.processAllAvailable()
      mem.addData(Seq((1L, 2L, "a2"))); q.processAllAvailable() // batch 1 -> compact
      mem.addData(Seq((3L, 1L, "c1"))); q.processAllAvailable()
      assert(snapshot() == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))
      // two delta batches + one compaction snapshot + one more delta
      assert(GenerationedTable.generations(spark, dir) == Seq(1, 2, 3, 4))
      // after vacuum, the bounded tail still reads correctly
      GenerationedTable.vacuum(spark, dir, keep = 2)
      assert(snapshot() == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))
    } finally { q.stop(); cleanup() }
  }
}
