package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions._
import graft.operators.{CorpusQueries, DedupQueries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for corpus ingest: documents streamed through
  * [[CorpusStreams.ingestStream]] must land exactly the documents a
  * driver-side simulation of the documented gates picks — quality,
  * benchmark decontamination, then ONLINE-GREEDY dedup (cross-batch
  * pairs drop the newcomer; within-batch components keep their minimum)
  * — and replaying a micro-batch must change nothing. */
class StreamingCorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private val corpusT = "sci_corpus"
  private val bandD = "/tmp/graft_sci_bands"

  private def cleanup(): Unit = {
    Seq(corpusT, s"${corpusT}_upsert_staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(bandD)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Minimal union-find for the within-batch component simulation. */
  private def componentMin(ids: Set[Long], pairs: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for ((a, b) <- pairs if ids(a) && ids(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  test("streamed ingest matches the gate-by-gate greedy simulation") {
    cleanup()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "text")
    val toks = size(tokens(col("text")))
    val dtoks = size(array_distinct(tokens(col("text"))))

    // the gates, recomputed independently for the expectation
    val qualityIds = docs.filter(toks >= 20 && dtoks * 10 >= toks * 3)
      .select("doc_id").as[Long].collect().toSet
    val bg = CorpusQueries.benchGrams(spark, sf0001)
    val contaminatedIds = docs
      .select(col("doc_id"),
        explode(array_distinct(wordShingles(tokens(col("text")), 5))).as("g"))
      .join(bg, "g").select("doc_id").distinct().as[Long].collect().toSet
    val candUniverse = (qualityIds -- contaminatedIds).filter(_ % 97 != 0)
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    assert(qualityIds.size < allIds.size, "premise: quality gate must fire")
    assert(contaminatedIds.nonEmpty, "premise: decontamination must fire")

    // full near-dup pair set over the candidate universe
    val candDocs = docs.join(candUniverse.toSeq.toDF("doc_id"), Seq("doc_id"))
    val pairSet = DedupQueries.lshPairsFrom(DedupQueries.shinglesOf(candDocs))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairSet.nonEmpty, "premise: dedup gate must have pairs to act on")

    // greedy simulation over three arrival waves (doc_id % 3)
    var kept = Set.empty[Long]
    for (wave <- 0 until 3) {
      val candB = candUniverse.filter(_ % 3 == wave)
      val crossDrop = candB.filter(c =>
        kept.exists(k => pairSet((math.min(c, k), math.max(c, k)))))
      val comp = componentMin(candB, pairSet)
      val withinDrop = candB.filter(c => comp(c) != c)
      kept ++= candB -- crossDrop -- withinDrop
    }
    assert(kept.size < candUniverse.size, "premise: dedup must drop someone")

    // the stream, same three waves
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = CorpusStreams.ingestStream(
      mem.toDF().toDF("doc_id", "source", "text"), corpusT, bg, bandD,
      buckets = 4)
      .start()
    val rows = docs.as[(Long, String, String)].collect()
    try {
      for (wave <- 0 until 3) {
        mem.addData(rows.filter(_._1 % 3 == wave).toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table(corpusT).select("doc_id").as[Long].collect().toSet
      assert(got == kept,
        s"missing=${(kept -- got).take(5)} extra=${(got -- kept).take(5)}")
      // the stored band index covers exactly the kept docs, once each
      val bands = spark.read.parquet(bandD)
      assert(bands.select("doc_id").distinct().as[Long].collect().toSet == kept,
        "band index out of sync with the kept corpus")
      assert(bands.count() == kept.size * 8L)

      // replay the final wave with ITS batch id: the keyed merge and
      // the per-batch band partition must not move
      CorpusStreams.processBatch(
        rows.filter(_._1 % 3 == 2).toIndexedSeq.toDF("doc_id", "source", "text"),
        batchId = 2L, corpusT, bg, bandD, buckets = 4)
      assert(spark.table(corpusT).select("doc_id").as[Long].collect().toSet == kept,
        "replayed micro-batch changed the corpus table")
      assert(spark.read.parquet(bandD).count() == kept.size * 8L,
        "replayed micro-batch changed the band index")
    } finally { q.stop(); cleanup() }
  }

  test("re-crawl of a KEPT doc fails the contract; a DROPPED doc may " +
    "re-enter the gates") {
    cleanup()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "text")
    val bg = CorpusQueries.benchGrams(spark, sf0001)
    try {
      CorpusStreams.processBatch(docs, 0L, corpusT, bg, bandD, buckets = 4)
      val kept = spark.table(corpusT).select("doc_id").as[Long].collect().toSet
      val dropped =
        docs.select("doc_id").as[Long].collect().toSet -- kept
      assert(kept.nonEmpty && dropped.nonEmpty, "premise: both outcomes")
      // a KEPT doc re-crawled with changed text would ghost its old
      // band rows and stale its corpus text — must refuse
      val e = intercept[IllegalArgumentException] {
        CorpusStreams.processBatch(
          Seq((kept.head, "s", "changed text entirely"))
            .toDF("doc_id", "source", "text"),
          1L, corpusT, bg, bandD, buckets = 4)
      }
      assert(e.getMessage.contains("re-ingests"), e.getMessage)
      // a DROPPED (or gated-out) id is NOT in the kept index: its
      // re-fetch re-enters the gates without a throw (greedy semantics
      // — its blocking keeper may have been purged since); its ledger
      // presence only routes it through the exact scan
      CorpusStreams.processBatch(
        docs.filter(col("doc_id") === dropped.head),
        1L, corpusT, bg, bandD, buckets = 4)
    } finally cleanup()
  }
}
