package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The artifact-vs-live byte sentinel (round-12 verdict item 2): the
  * manifest guards are metadata-only, so a served artifact whose BYTES
  * no longer match its live recompute (the only hypothesis left for the
  * rounds-11/12 `q_quality_tertiles` red row) must be caught by
  * digesting both sides — and healed by invalidate + rebuild, not just
  * reported. */
class ArtifactSentinelSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/tmp/graft_sentinel_spec"

  private def withScratchCatalog[T](body: => T): T = {
    IndexCatalog.rootOverride = Some(s"$base/catalog")
    IndexCatalog.resetProcessMemo()
    try body
    finally {
      IndexCatalog.rootOverride = None
      IndexCatalog.resetProcessMemo()
    }
  }

  test("digest is order- and projection-order-insensitive, value-sensitive") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val shuffled = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "v")
      .select("v", "id") // different row AND column order
    assert(ArtifactSentinel.digest(a) == ArtifactSentinel.digest(shuffled))
    val tampered = Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("id", "v")
    assert(ArtifactSentinel.digest(a) != ArtifactSentinel.digest(tampered))
    val shorter = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    assert(ArtifactSentinel.digest(a) != ArtifactSentinel.digest(shorter))
  }

  test("planted stale artifact: detected, invalidated, rebuilt, healed") {
    withScratchCatalog {
      val input = s"$base/input"
      spark.range(20).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(input)
      val key = s"sentinel_probe_${System.nanoTime}"
      val builds = new AtomicInteger(0)
      def artifact() = {
        val dir = IndexCatalog.ensure(spark, key, inputs = Seq(input)) { d =>
          builds.incrementAndGet()
          spark.read.parquet(input).withColumn("sq", col("id") * col("id"))
            .write.mode("overwrite").parquet(s"$d/data")
        }
        spark.read.parquet(s"$dir/data")
      }
      def live() = spark.read.parquet(input)
        .withColumn("sq", col("id") * col("id"))
      val check = ArtifactSentinel.Check(
        "probe", _ => key, (_, _) => artifact(), (_, _) => live())

      artifact().count() // commit the artifact
      assert(builds.get() == 1)
      val clean = ArtifactSentinel.run(spark, input, Seq(check))
      assert(clean == Seq("probe" -> "ok"))
      assert(builds.get() == 1, "an ok sentinel must not rebuild")

      // PLANT: rewrite the artifact bytes WITHOUT touching the manifest —
      // the adopt-validating metadata all still matches, exactly the
      // straddle the manifest guards cannot see
      val dir = IndexCatalog.ensure(spark, key, inputs = Seq(input)) { _ =>
        fail("plant must adopt, not rebuild")
      }
      spark.range(20).toDF("id").withColumn("sq", lit(7L))
        .write.mode("overwrite").parquet(s"$dir/data")
      IndexCatalog.resetProcessMemo() // fresh process adopts the plant
      val planted = ArtifactSentinel.run(spark, input, Seq(check))
      assert(planted.head._2.startsWith("healed:stale-artifact"),
        s"plant not healed: ${planted.head._2}")
      assert(builds.get() == 2, "heal must rebuild exactly once")
      // and the served artifact is live-equal again
      assert(ArtifactSentinel.run(spark, input, Seq(check)) ==
        Seq("probe" -> "ok"))
    }
  }

  test("a check that throws before any divergence records error: and the " +
    "sweep continues") {
    val ok = Seq((1L, "x")).toDF("id", "v")
    val boom = ArtifactSentinel.Check("boom", _ => "no-such-key",
      (_, _) => throw new IllegalStateException("table missing at this SF"),
      (_, _) => ok)
    val fine = ArtifactSentinel.Check("fine", _ => "no-such-key",
      (_, _) => ok, (_, _) => ok)
    val report = ArtifactSentinel.run(spark, "unused", Seq(boom, fine))
    assert(report.head._1 == "boom" &&
      report.head._2.startsWith("error:IllegalStateException"),
      report.toString)
    assert(report(1) == ("fine" -> "ok"),
      "a throwing check aborted the rest of the sweep")
  }

  test("a PROVEN divergence whose heal path throws stays a gate-failing " +
    "MISMATCH, never an error: status") {
    withScratchCatalog {
      // artifact call 1 serves STALE bytes (divergence established);
      // the heal's re-read (call 2) throws — the status must keep the
      // MISMATCH prefix Verify fails on, not soften to error:
      val stale = Seq((1L, "STALE")).toDF("id", "v")
      val liveF = Seq((1L, "live")).toDF("id", "v")
      val calls = new AtomicInteger(0)
      val check = ArtifactSentinel.Check("flaky-heal", _ => "flaky-heal-key",
        (_, _) =>
          if (calls.incrementAndGet() == 1) stale
          else throw new IllegalStateException("rebuild crashed"),
        (_, _) => liveF)
      val report = ArtifactSentinel.run(spark, "unused", Seq(check))
      assert(report.head._2.startsWith("MISMATCH:heal-failed"),
        report.toString)
      assert(report.head._2.contains("IllegalStateException"),
        "heal failure cause missing from the status")
    }
  }

  test("registry checks pass green on a fresh tier (kn_scores end-to-end)") {
    withScratchCatalog {
      // the real registry member behind the rounds-11/12 red row, over
      // the real corpus: a fresh build must digest live-equal
      val checks = graft.operators.SentinelChecks.all.filter(_.name == "kn_scores")
      assert(checks.nonEmpty, "kn_scores sentinel missing from registry")
      val report = ArtifactSentinel.run(spark, sf0001, checks)
      assert(report == Seq("kn_scores" -> "ok"), report.toString)
    }
  }

  test("registry heals a tampered kn_scores artifact") {
    withScratchCatalog {
      val checks = graft.operators.SentinelChecks.all.filter(_.name == "kn_scores")
      graft.operators.LangModelQueries.knScores(spark, sf0001).count() // build + commit
      // tamper one column of the served frame, manifest untouched (the
      // artifact dir is root/key by the catalog's layout contract)
      val artDir = s"$base/catalog/kn_scores_${IndexCatalog.tag(sf0001)}"
      val tampered = spark.read.parquet(s"$artDir/scores")
        .withColumn("kn_bits", col("kn_bits") + 1L)
      val tmp = s"$base/tampered_scores"
      tampered.write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite")
        .parquet(s"$artDir/scores")
      IndexCatalog.resetProcessMemo()
      val report = ArtifactSentinel.run(spark, sf0001, checks)
      assert(report.head._2.startsWith("healed:stale-artifact"),
        report.toString)
    }
  }

  test("persistent-error ledger: two consecutive erroring runs escalate") {
    // a check that can never run must not silently disable its sentinel
    // (r14 advice item 2): first error is tolerated, the second
    // consecutive one over the same sf-dir is returned gate-failing,
    // and a clean run in between resets the strike
    val sfDir = s"$base/perr_sf_${System.nanoTime}" // unique ledger key
    def statuses(s: String*) = s.zipWithIndex.map { case (v, i) => s"c$i" -> v }
    assert(ArtifactSentinel.persistentErrors(sfDir,
      statuses("error:Boom:x", "ok")).isEmpty, "first error must only warn")
    val second = ArtifactSentinel.persistentErrors(sfDir,
      statuses("error:Boom:x", "ok"))
    assert(second == Seq("c0" -> "error:Boom:x"),
      s"second consecutive error must escalate: $second")
    // a clean run resets the ledger...
    assert(ArtifactSentinel.persistentErrors(sfDir, statuses("ok", "ok")).isEmpty)
    // ...so the next error is first-time again
    assert(ArtifactSentinel.persistentErrors(sfDir,
      statuses("error:Boom:x", "ok")).isEmpty, "strike must reset after a clean run")
    // errors on DIFFERENT checks across runs never escalate
    assert(ArtifactSentinel.persistentErrors(sfDir,
      statuses("ok", "error:Boom:y")).isEmpty)
  }
}
