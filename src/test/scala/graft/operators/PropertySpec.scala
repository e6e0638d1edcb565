package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** SURVEY §5.2 property tests over seeded random inputs: algebraic
  * identities the operators must satisfy on ANY data, not just golden
  * fixtures. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(42)
  private val types = ContentTypeMap.ContentTypes

  private def randomTyped(n: Int) = {
    val rows = Seq.fill(n)((
      s"C${rng.nextInt(8)}",
      types(rng.nextInt(types.size)),
      rng.nextInt(1000).toLong,
      f"202204${1 + rng.nextInt(28)}%02d"))
    rows.toDF("Contract", "Type", "TotalDuration", "d")
      .withColumn("log_date", to_date(col("d"), "yyyyMMdd")).drop("d")
  }

  test("pivot+sum over explicit values ≡ direct groupBy sum, re-widened (20 rounds)") {
    (1 to 20).foreach { _ =>
      val df = randomTyped(60)
      val viaPivot = Engagement.pivotDaily(df)
        .select(col("Contract") +: types.map(col): _*)
        .groupBy("Contract")
        .agg(sum(types.head).as(types.head),
             types.tail.map(t => sum(t).as(t)): _*)
      val direct = df.groupBy("Contract", "Type").agg(sum("TotalDuration").as("s"))
        .groupBy("Contract")
        .pivot("Type", types).sum("s").na.fill(0, types)
      assert(viaPivot.exceptAll(direct).count() == 0)
      assert(direct.exceptAll(viaPivot).count() == 0)
    }
  }

  test("taste lists exactly the nonzero totals, in canonical order (20 rounds)") {
    (1 to 20).foreach { _ =>
      val profile = Engagement(randomTyped(40))
      profile.collect().foreach { r =>
        val expected = types.filter(t =>
          r.getAs[Long]("Total_" + t.replace(' ', '_')) != 0L)
        assert(r.getAs[String]("Taste") == expected.mkString("-"))
      }
    }
  }

  test("top keyword always carries the max per-user count (20 rounds)") {
    (1 to 20).foreach { _ =>
      val logs = Seq.fill(120)((s"u${rng.nextInt(6)}", s"kw${rng.nextInt(9)}"))
        .toDF("user_id", "keyword")
      val counts = logs.groupBy("user_id", "keyword").count()
      val maxes = counts.groupBy("user_id").agg(max("count").as("mx"))
        .as[(String, Long)].collect().toMap
      val top = TopKeyword(logs)
      val withCount = top.join(counts,
        top("user_id") === counts("user_id") && top("most_search") === counts("keyword"))
        .select(top("user_id"), col("count")).as[(String, Long)].collect()
      withCount.foreach { case (u, c) => assert(c == maxes(u)) }
      assert(top.count() == maxes.size)
    }
  }

  test("most-watched always names a column holding the row maximum (20 rounds)") {
    (1 to 20).foreach { _ =>
      Engagement(randomTyped(40)).collect().foreach { r =>
        val totals = types.map(t => t -> r.getAs[Long]("Total_" + t.replace(' ', '_'))).toMap
        assert(totals(r.getAs[String]("Most Watched")) == totals.values.max)
      }
    }
  }

  test("as-of joins ≡ brute-force reference on random histories (10 rounds)") {
    (1 to 10).foreach { round =>
      val nL = 40; val nR = 60
      val left = Seq.tabulate(nL)(i =>
        (s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong, i.toLong))
        .toDF("k", "t", "lid")
      // duplicate right timestamps on purpose: the dedup tie-break
      // (greatest payload) must match the reference below
      val right = Seq.tabulate(nR)(i =>
        (s"k${rng.nextInt(5)}", rng.nextInt(500).toLong * 2, i.toLong))
        .toDF("k", "rt", "rid")
      val rightRows = right.as[(String, Long, Long)].collect()
        .groupBy { case (k, rt, _) => (k, rt) }
        .map { case (_, rows) => rows.maxBy(_._3) } // greatest payload per instant
        .toSeq

      def backRef(k: String, t: Long): Option[Long] =
        rightRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      def fwdRef(k: String, t: Long): Option[Long] =
        rightRows.filter(r => r._1 == k && r._2 >= t)
          .sortBy(r => (-r._2, -r._3)).lastOption.map(_._3)
      def nearRef(k: String, t: Long): Option[Long] = {
        val b = rightRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption
        val f = rightRows.filter(r => r._1 == k && r._2 >= t)
          .sortBy(r => (-r._2, -r._3)).lastOption
        (b, f) match {
          case (Some(bb), Some(ff)) =>
            Some(if (t - bb._2 <= ff._2 - t) bb._3 else ff._3)
          case (b2, f2) => b2.orElse(f2).map(_._3)
        }
      }

      val leftRows = left.as[(String, Long, Long)].collect()
      def check(out: org.apache.spark.sql.DataFrame, ref: (String, Long) => Option[Long], name: String): Unit = {
        val got = out.select("lid", "rid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        leftRows.foreach { case (k, t, lid) =>
          assert(got(lid) == ref(k, t), s"round $round $name: left ($k,$t,$lid)")
        }
      }
      check(AsOfJoin.backward(left, right, "k", "t", "rt", Seq("rid")), backRef, "backward")
      check(AsOfJoin.forward(left, right, "k", "t", "rt", Seq("rid")), fwdRef, "forward")
      check(AsOfJoin.nearest(left, right, "k", "t", "rt", Seq("rid")), nearRef, "nearest")

      // maxGap variants: the brute-force reference restricts candidates
      // to the window FIRST, then picks — the nearest-within-window
      // semantics the gate must reproduce (inclusive bound)
      val g = (rng.nextInt(300) + 1).toLong
      def backRefG(k: String, t: Long): Option[Long] =
        rightRows.filter(r => r._1 == k && r._2 <= t && t - r._2 <= g)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      def fwdRefG(k: String, t: Long): Option[Long] =
        rightRows.filter(r => r._1 == k && r._2 >= t && r._2 - t <= g)
          .sortBy(r => (-r._2, -r._3)).lastOption.map(_._3)
      def nearRefG(k: String, t: Long): Option[Long] = {
        val b = rightRows.filter(r => r._1 == k && r._2 <= t && t - r._2 <= g)
          .sortBy(r => (r._2, r._3)).lastOption
        val f = rightRows.filter(r => r._1 == k && r._2 >= t && r._2 - t <= g)
          .sortBy(r => (-r._2, -r._3)).lastOption
        (b, f) match {
          case (Some(bb), Some(ff)) =>
            Some(if (t - bb._2 <= ff._2 - t) bb._3 else ff._3)
          case (b2, f2) => b2.orElse(f2).map(_._3)
        }
      }
      check(AsOfJoin.backward(left, right, "k", "t", "rt", Seq("rid"), Some(g)),
            backRefG, s"backward-gap$g")
      check(AsOfJoin.forward(left, right, "k", "t", "rt", Seq("rid"), Some(g)),
            fwdRefG, s"forward-gap$g")
      check(AsOfJoin.nearest(left, right, "k", "t", "rt", Seq("rid"), Some(g)),
            nearRefG, s"nearest-gap$g")
    }
  }
}
