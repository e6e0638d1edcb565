package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial-skew guard for blocked entity resolution (round-8
  * verdict item 2): a table where 90% of rows share one block key must
  * run its match stage over bounded sub-blocks instead of one
  * quadratic straggler — the [[ResolutionQueries.subBlocked]] twin of
  * the LSH bucket cap, with partial in-block recall instead of a drop.
  */
class ErSkewGuardSpec extends SparkSpec {
  import spark.implicits._

  private val nHot = 1800
  private val nTail = 200
  private val cap = 100

  /** 1800 rows sharing the suffix block "xyz" (distinct names, so the
    * match stage keeps its levenshtein work) + 200 tail rows in small
    * blocks, where tail rows 2i/2i+1 are genuine near-matches (names at
    * edit distance 1 sharing a block). */
  private lazy val rows = {
    val hot = (0 until nHot).map(i => (i.toLong, f"Customer#$i%09d hotxyz", "xyz"))
    val tail = (0 until nTail).map { i =>
      val blk = s"t${i / 2}"
      val name = f"Tail#${i / 2}%05d${if (i % 2 == 0) "a" else "b"}$blk"
      ((nHot + i).toLong, name, blk)
    }
    (hot ++ tail).toDF("id", "nm", "blk")
  }

  test("sub-blocking bounds every joined block at ~cap members") {
    val sb = ResolutionQueries.subBlocked(rows, cap)
    val sizes = sb.groupBy("blk2").count().as[(String, Long)].collect().toMap
    // the hot block split into ceil(1800/100)=18 slices; dense ids mod
    // 18 spread exactly evenly
    assert(sizes.keys.count(_.startsWith("xyz#")) == 18)
    assert(sizes.forall { case (_, n) => n <= cap },
      s"oversized sub-block survived: ${sizes.filter(_._2 > cap)}")
    // cold blocks keep their key untouched
    assert(sizes.contains("t0") && sizes("t0") == 2)
  }

  test("capped match completes with bounded candidates; true tail matches survive") {
    val pairs = ResolutionQueries.matchPairsFrom(spark, rows, cap)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet
    // every tail near-match pairs through its small block
    val expected = (0 until nTail / 2)
      .map(i => ((nHot + 2L * i), (nHot + 2L * i + 1))).toSet
    assert(expected.subsetOf(pairs),
      s"missing ${expected.diff(pairs).size} true tail pairs")
    // hot-block candidates stayed within sub-blocks: any surviving hot
    // pair must agree on id % 18 (the slice key)
    assert(pairs.filter(p => p._1 < nHot && p._2 < nHot)
      .forall(p => p._1 % 18 == p._2 % 18))
  }

  test("capped pairs are a subset of uncapped pairs") {
    val capped = ResolutionQueries.matchPairsFrom(spark, rows, cap)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet
    val uncapped = ResolutionQueries.matchPairsFrom(spark, rows, Int.MaxValue)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped))
  }

  test("telemetry names exactly the hot block with its slice count") {
    val over = ResolutionQueries.erOversizedBlocks(rows, cap).collect()
    assert(over.length == 1)
    assert(over.head.getAs[String]("blk") == "xyz")
    assert(over.head.getAs[Long]("n_members") == nHot)
    assert(over.head.getAs[Long]("n_sub") == 18)
  }

  test("healthy corpora are untouched by the default cap") {
    val demo = ResolutionQueries.demographicRows(spark, sf0001, None)
    val sfx = ResolutionQueries.suffixRows(spark, sf0001)
    for (r <- Seq(demo, sfx)) {
      assert(ResolutionQueries.erOversizedBlocks(r).isEmpty)
      val sb = ResolutionQueries.subBlocked(r, ResolutionQueries.ErMaxBlock)
      assert(sb.filter(col("blk2").contains("#")).isEmpty,
        "no sub-block keys expected on the bench corpus")
    }
    // and the guarded match equals the unguarded one end to end
    val capped = ResolutionQueries.matchPairsFrom(spark, demo,
      ResolutionQueries.ErMaxBlock)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet
    val uncapped = ResolutionQueries.matchPairsFrom(spark, demo, Int.MaxValue)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
  }

  test("the guarded plan spreads the hot block across tasks (no straggler)") {
    val sb = ResolutionQueries.subBlocked(rows, cap)
    // the join key domain now has 18+100 values instead of 101 with one
    // 90%-heavy key — assert the shuffle-side skew is gone at the key
    // level: max key share <= cap / total
    val total = rows.count().toDouble
    val maxShare = sb.groupBy("blk2").count()
      .agg(max(col("count"))).as[Long].head() / total
    assert(maxShare <= cap / total + 1e-9,
      f"hot key still holds $maxShare%.2f of the rows")
  }
}
