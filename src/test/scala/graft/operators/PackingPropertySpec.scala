package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property tests over seeded random corpora for the packing machinery:
  * identities that must hold on ANY (doc_id, toks) distribution — not
  * just the driver corpus — covering sparse/duplicate-free ids, heavy
  * token skew, and budget-dwarfing documents. */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(1234)

  /** Random frame: sparse non-contiguous doc ids, token counts from 1
    * to ~3L so single docs regularly span multiple sequences. */
  private def randomToks(n: Int, maxToks: Int) = {
    val ids = rng.shuffle((0 until n * 7).map(_.toLong).toVector).take(n)
    ids.map(id => (id, 1L + rng.nextInt(maxToks))).toDF("doc_id", "toks")
  }

  test("packGlobal ≡ single-window cumsum on random corpora (10 rounds)") {
    (1 to 10).foreach { _ =>
      val df = randomToks(400, maxToks = 1500)
      val got = ShardPacking.packGlobal(df).select("doc_id", "cum_before")
      val w = Window.orderBy(ShardPacking.bucketOf(col("doc_id")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = df.withColumn("cum_before",
        coalesce(sum("toks").over(w), lit(0L))).select("doc_id", "cum_before")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("chunkSequences invariants hold on random corpora (10 rounds)") {
    (1 to 10).foreach { round =>
      val L = 512L
      val df = randomToks(300, maxToks = 2000)
      val total = df.agg(sum("toks")).collect()(0).getLong(0)
      val seqs = ShardPacking.chunkSequences(df, L)
        .collect().sortBy(_.getLong(0))
      // ids contiguous from 0, count = ceil(total / L)
      assert(seqs.length == ((total + L - 1) / L).toInt, s"round $round: count")
      seqs.map(_.getLong(0)).zipWithIndex.foreach { case (s, i) =>
        assert(s == i, s"round $round: ids not contiguous")
      }
      // exact fill everywhere but the tail; conservation; sane doc counts
      seqs.dropRight(1).foreach(r => assert(r.getLong(2) == L))
      assert(seqs.map(_.getLong(2)).sum == total, s"round $round: conservation")
      seqs.foreach { r =>
        assert(r.getLong(1) >= 1 && r.getLong(3) <= r.getLong(1),
          s"round $round: doc counts")
      }
      // cross-check: per-doc span arithmetic reproduces the doc counts
      val spanned = ShardPacking.packGlobal(df)
        .select(col("cum_before"), col("toks")).collect()
        .flatMap { r =>
          val cb = r.getLong(0); val t = r.getLong(1)
          (cb / L) to ((cb + t - 1) / L)
        }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      seqs.foreach { r =>
        assert(spanned(r.getLong(0)) == r.getLong(1),
          s"round $round: seq ${r.getLong(0)} doc count mismatch")
      }
    }
  }
}
