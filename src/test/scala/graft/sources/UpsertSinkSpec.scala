package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Upsert algebra: sequential daily loads equal a keep-latest batch
  * recompute, the merge is deterministic under version ties, and the
  * bucketed layout survives the staging swap. */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val sink = UpsertBucketedSink(4, Seq("k"), "ver")

  private def cleanup(): Unit = {
    spark.sql("DROP TABLE IF EXISTS upsert_t")
    spark.sql("DROP TABLE IF EXISTS upsert_t_upsert_staging")
  }

  test("upsert(day1) then upsert(day2) equals keep-latest over the union") {
    cleanup()
    try {
      val day1 = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "c"))
        .toDF("k", "ver", "v")
      val day2 = Seq((2L, 20L, "b2"), (3L, 5L, "stale"), (4L, 20L, "d"))
        .toDF("k", "ver", "v")
      sink.write(day1, "upsert_t")
      sink.write(day2, "upsert_t")
      val got = spark.table("upsert_t").orderBy("k")
        .as[(Long, Long, String)].collect().toSeq
      // k=2 replaced by the newer version; k=3 keeps day1 (day2 is older);
      // k=1 untouched; k=4 inserted
      assert(got == Seq((1L, 10L, "a"), (2L, 20L, "b2"),
                        (3L, 10L, "c"), (4L, 20L, "d")))
    } finally cleanup()
  }

  test("version ties resolve deterministically across reruns") {
    cleanup()
    try {
      val day1 = Seq((1L, 10L, "x")).toDF("k", "ver", "v")
      val day2 = Seq((1L, 10L, "z"), (1L, 10L, "y")).toDF("k", "ver", "v")
      sink.write(day1, "upsert_t")
      sink.write(day2.repartition(3), "upsert_t")
      val got = spark.table("upsert_t").as[(Long, Long, String)].collect().toSeq
      assert(got == Seq((1L, 10L, "z"))) // greatest remaining column wins
    } finally cleanup()
  }

  test("a swap interrupted between DROP and RENAME recovers the merged state") {
    cleanup()
    try {
      val day1 = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "ver", "v")
      sink.write(day1, "upsert_t")
      // crash window: the fully-merged state sits in staging, the
      // serving table is gone (round-12 advice item 3's sibling case)
      BucketedTableSink(4, Seq("k")).write(
        spark.table("upsert_t"), "upsert_t_upsert_staging")
      spark.sql("DROP TABLE upsert_t")
      // the replayed write must adopt the staging, then merge — NOT
      // fresh-create a table holding only its own rows
      sink.write(Seq((3L, 20L, "c")).toDF("k", "ver", "v"), "upsert_t")
      val got = spark.table("upsert_t").orderBy("k")
        .as[(Long, Long, String)].collect().toSeq
      assert(got == Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "c")),
        s"pre-crash rows lost: $got")
    } finally cleanup()
  }

  test("scope-owned groups shrink with their batch instead of mixing generations") {
    cleanup()
    try {
      val scoped = UpsertBucketedSink(4, Seq("k", "rank"), "ver",
        scopeCols = Seq("k"))
      val gen0 = Seq((1L, 1, 0L, "a1"), (1L, 2, 0L, "a2"), (1L, 3, 0L, "a3"),
        (2L, 1, 0L, "b1")).toDF("k", "rank", "ver", "v")
      scoped.write(gen0, "upsert_t")
      // generation 1 re-emits k=1 with FEWER rows: the group must shrink
      val gen1 = Seq((1L, 1, 1L, "n1"), (1L, 2, 1L, "n2"))
        .toDF("k", "rank", "ver", "v")
      scoped.write(gen1, "upsert_t")
      val got = spark.table("upsert_t").orderBy("k", "rank")
        .as[(Long, Int, Long, String)].collect().toSeq
      assert(got == Seq((1L, 1, 1L, "n1"), (1L, 2, 1L, "n2"),
        (2L, 1, 0L, "b1")),
        s"stale rank-3 row must die with its generation: $got")
      // version guard: an OLDER generation's late write cannot delete a
      // newer generation's rows (out-of-order replay protection)
      scoped.write(Seq((1L, 1, 0L, "old")).toDF("k", "rank", "ver", "v"),
        "upsert_t")
      val guarded = spark.table("upsert_t").orderBy("k", "rank")
        .as[(Long, Int, Long, String)].collect().toSeq
      assert(guarded == got,
        s"an older generation deleted newer rows: $guarded")
    } finally cleanup()
  }

  test("an explicit scope frame evicts scopes whose new generation is EMPTY") {
    cleanup()
    try {
      // the ANN zero-result edge (round-13 advice item 5): a re-streamed
      // query probing an empty cell produces NO output rows, so
      // output-derived scopes would never see its key and the old
      // generation would keep serving; input-derived scopes must evict it
      val scoped = UpsertBucketedSink(4, Seq("k", "rank"), "ver",
        scopeCols = Seq("k"))
      val gen0 = Seq((1L, 1, 0L, "a1"), (1L, 2, 0L, "a2"), (2L, 1, 0L, "b1"))
        .toDF("k", "rank", "ver", "v")
      scoped.write(gen0, "upsert_t")
      // generation 1 re-streams k=1 and gets zero results: df is EMPTY,
      // the scope frame (from the caller's input keys) carries k=1
      val empty = Seq.empty[(Long, Int, Long, String)]
        .toDF("k", "rank", "ver", "v")
      val scopes = Seq((1L, 1L)).toDF("k", "ver")
      scoped.write(empty, "upsert_t", Some(scopes))
      val got = spark.table("upsert_t").orderBy("k", "rank")
        .as[(Long, Int, Long, String)].collect().toSeq
      assert(got == Seq((2L, 1, 0L, "b1")),
        s"the superseded generation kept serving a zero-result scope: $got")
    } finally cleanup()
  }

  test("the merged table keeps its bucket spec and statistics") {
    cleanup()
    try {
      sink.write(Seq((1L, 1L, "a")).toDF("k", "ver", "v"), "upsert_t")
      sink.write(Seq((2L, 1L, "b")).toDF("k", "ver", "v"), "upsert_t")
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("upsert_t"))
      assert(meta.bucketSpec.exists(b =>
        b.numBuckets == 4 && b.bucketColumnNames == Seq("k")))
      assert(meta.stats.exists(_.rowCount.exists(_.toLong == 2L)))
    } finally cleanup()
  }
}
