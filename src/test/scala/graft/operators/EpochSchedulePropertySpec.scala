package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property pins for the shared epoch-schedule kernel over 20 seeded
  * random corpora (varying source counts, doc counts, token masses,
  * zero-token docs, zero-mass sources): the schedule must always
  * reconcile exactly, never overdraw its target or the one-corpus
  * budget, keep the partial prefix inside the remainder, and emit
  * exactly the positive-mass sources. */
class EpochSchedulePropertySpec extends SparkSpec {
  import spark.implicits._

  test("schedule invariants hold over 20 seeded random corpora") {
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val nSrc = 1 + rnd.nextInt(6)
      val rows = (0 until nSrc).flatMap { s =>
        val nDocs = rnd.nextInt(31)
        (0 until nDocs).map { i =>
          (s * 1000L + i, s"src$s", rnd.nextInt(51).toLong)
        }
      }
      if (rows.nonEmpty) {
        val pd = rows.toDF("doc_id", "source", "dtoks")
        val got = CorpusQueries.epochScheduleFrame(pd).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

        val massBySrc = rows.groupBy(_._2).view
          .mapValues(_.map(_._3).sum).toMap
        val positive = massBySrc.filter(_._2 > 0)
        assert(got.map(_._1).toSet == positive.keySet,
          s"seed $seed: emitted sources != positive-mass sources")

        got.foreach { case (src, avail, target, full, pDocs, pToks, drawn, milli) =>
          assert(avail == positive(src), s"seed $seed/$src: avail mass")
          assert(drawn == full * avail + pToks, s"seed $seed/$src: reconcile")
          assert(drawn <= target, s"seed $seed/$src: overdraw")
          assert(pToks <= target % avail, s"seed $seed/$src: partial > remainder")
          assert(milli == 1000L * drawn / avail, s"seed $seed/$src: epoch ratio")
          assert(pDocs >= 0 && pToks >= 0 && full >= 0, s"seed $seed/$src: signs")
          if (target > avail)
            assert(full >= 1, s"seed $seed/$src: upsampled source lost its pass")
        }
        // one-corpus-equivalent budget: Σ target ≤ Σ avail (ppm floor)
        assert(got.map(_._3).sum <= positive.values.sum,
          s"seed $seed: targets exceed the corpus-equivalent budget")
      }
    }
  }
}
