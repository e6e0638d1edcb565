package graft.operators

import graft.SparkSpec

/** Backward as-of semantics: latest prior match, inclusive equality,
  * null on no-match, per-key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("picks the latest right row at or before the left time, per key") {
    val left = Seq(("u1", 100L, "p1"), ("u1", 50L, "p2"), ("u2", 10L, "p3"))
      .toDF("k", "t", "pid")
    val right = Seq(("u1", 40L, "c1"), ("u1", 100L, "c2"), ("u1", 120L, "c3"),
                    ("u2", 20L, "c4"))
      .toDF("k", "rt", "cid")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("cid"))
      .select("pid", "cid").as[(String, Option[String])].collect().toMap
    assert(out("p1").contains("c2")) // equal timestamp matches (inclusive)
    assert(out("p2").contains("c1")) // latest at-or-before 50 is 40
    assert(out("p3").isEmpty)        // u2's only click is AFTER the purchase
  }

  test("duplicate (key, rightTime) rows resolve deterministically to the greatest payload") {
    val left = Seq(("u1", 100L, "p1")).toDF("k", "t", "pid")
    val right = Seq(("u1", 50L, "ca"), ("u1", 50L, "cz"), ("u1", 50L, "cm"))
      .toDF("k", "rt", "cid")
    (1 to 5).foreach { _ =>
      val out = AsOfJoin.backward(
          left, right.repartition(3), "k", "t", "rt", Seq("cid"))
        .select("cid").as[String].collect().toSeq
      assert(out == Seq("cz")) // greatest first-payload value wins, every run
    }
  }

  test("left rows with no right rows at all for the key get nulls") {
    val left = Seq(("solo", 5L, "p")).toDF("k", "t", "pid")
    val right = Seq(("other", 1L, "c")).toDF("k", "rt", "cid")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("cid"))
    assert(out.count() == 1)
    assert(out.select("cid").collect().head.isNullAt(0))
  }

  test("row count always equals the left side (left-join contract)") {
    val left = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 3L, "z"))
      .toDF("k", "t", "pid")
    val right = Seq(("a", 0L, "r1"), ("a", 1L, "r2")).toDF("k", "rt", "cid")
    assert(AsOfJoin.backward(left, right, "k", "t", "rt", Seq("cid")).count() == 3)
  }

  test("forward picks the earliest right row at or after the left time") {
    val left = Seq(("u1", 100L, "p1"), ("u1", 50L, "p2"), ("u2", 30L, "p3"))
      .toDF("k", "t", "pid")
    val right = Seq(("u1", 40L, "c1"), ("u1", 100L, "c2"), ("u1", 120L, "c3"),
                    ("u2", 20L, "c4"))
      .toDF("k", "rt", "cid")
    val out = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("cid"))
      .select("pid", "cid").as[(String, Option[String])].collect().toMap
    assert(out("p1").contains("c2")) // inclusive equality
    assert(out("p2").contains("c2")) // earliest at-or-after 50 is 100
    assert(out("p3").isEmpty)        // u2's only click is BEFORE the purchase
  }

  test("nearest picks the closer side; exact ties go backward") {
    val left = Seq(("u", 100L, "mid"), ("u", 55L, "nearBack"),
                   ("u", 130L, "nearFwd"), ("u", 10L, "onlyFwd"))
      .toDF("k", "t", "pid")
    val right = Seq(("u", 50L, "b"), ("u", 150L, "f")).toDF("k", "rt", "cid")
    val out = AsOfJoin.nearest(left, right, "k", "t", "rt", Seq("cid"))
      .select("pid", "cid").as[(String, String)].collect().toMap
    assert(out("mid") == "b")      // 50 each way: tie -> backward
    assert(out("nearBack") == "b") // 5 back vs 95 forward
    assert(out("nearFwd") == "f")  // 80 back vs 20 forward
    assert(out("onlyFwd") == "b")  // no backward match: earliest later row (t=50) wins
  }

  test("maxGap nulls matches beyond the window; inclusive at the bound") {
    val left = Seq(("u", 100L, "exact"), ("u", 130L, "near"), ("u", 500L, "far"))
      .toDF("k", "t", "pid")
    val right = Seq(("u", 50L, "c")).toDF("k", "rt", "cid")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("cid"),
                                maxGap = Some(50L))
      .select("pid", "cid").as[(String, Option[String])].collect().toMap
    assert(out("exact").contains("c")) // gap 50 == maxGap: inclusive
    assert(out("near").isEmpty)        // gap 80 > 50
    assert(out("far").isEmpty)
  }

  test("nearest with maxGap: a too-far backward match never shadows an in-window forward one") {
    val left = Seq(("u", 100L, "p")).toDF("k", "t", "pid")
    val right = Seq(("u", 10L, "back"), ("u", 120L, "fwd")).toDF("k", "rt", "cid")
    // ungated nearest picks "back"? no — 90 back vs 20 fwd → fwd; make
    // backward the closer one so the gate is what flips the choice
    val right2 = Seq(("u", 95L, "back"), ("u", 140L, "fwd")).toDF("k", "rt", "cid")
    val ungated = AsOfJoin.nearest(left, right2, "k", "t", "rt", Seq("cid"))
      .select("cid").as[String].collect().head
    assert(ungated == "back") // 5 back vs 40 forward
    val gated = AsOfJoin.nearest(left, right2, "k", "t", "rt", Seq("cid"),
                                 maxGap = Some(3L))
      .select("cid").as[Option[String]].collect().head
    assert(gated.isEmpty) // both outside a 3-tick window
    val gated2 = AsOfJoin.nearest(left, right, "k", "t", "rt", Seq("cid"),
                                  maxGap = Some(30L))
      .select("cid").as[String].collect().head
    assert(gated2 == "fwd") // back is 90 away (out), fwd 20 away (in)
  }

  test("internal names never collide with user columns") {
    // left already uses the operator's first-choice internal names
    val left = Seq(("u", 100L, "x", "y")).toDF("k", "t", "_asof0_t", "_asof0_side")
    val right = Seq(("u", 50L, "c")).toDF("k", "rt", "cid")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("cid"))
    val row = out.select("_asof0_t", "_asof0_side", "cid").collect().head
    assert(row.getString(0) == "x" && row.getString(1) == "y" && row.getString(2) == "c")
  }

  test("payload names colliding with left columns are rejected") {
    val left = Seq(("u", 1L, "x")).toDF("k", "t", "cid")
    val right = Seq(("u", 1L, "c")).toDF("k", "rt", "cid")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, "k", "t", "rt", Seq("cid"))
    }
  }
}
