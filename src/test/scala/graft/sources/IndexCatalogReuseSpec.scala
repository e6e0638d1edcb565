package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.{SparkSpec, Tables}
import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

/** The content-keyed artifact manifest (round-5 verdict item 2): an
  * artifact committed by one process is ADOPTED by the next — validated
  * by key, builder version, input fingerprint and code fingerprint —
  * instead of being rebuilt per applicationId. Rebuild triggers: a
  * changed corpus behind the same path, a missing/corrupt manifest, and
  * the explicit escape hatch. Bucketed metastore tables re-register via
  * replayed DDL with their bucket spec intact. */
class IndexCatalogReuseSpec extends SparkSpec {
  import spark.implicits._

  private val inputDir = "/tmp/graft_catalog_reuse_input"

  private def writeInput(rows: Int): Unit =
    spark.range(rows).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(inputDir)

  /** Fresh-process simulation: the on-disk manifest carries all state. */
  private def freshProcess(): Unit = IndexCatalog.resetProcessMemo()

  test("a second process adopts a committed artifact without rebuilding") {
    writeInput(10)
    val key = s"reuse_probe_${System.nanoTime}"
    val builds = new AtomicInteger(0)
    def run() = IndexCatalog.ensure(spark, key, inputs = Seq(inputDir)) { dir =>
      builds.incrementAndGet()
      spark.range(5).toDF("v").write.mode("overwrite").parquet(s"$dir/data")
    }
    val dir1 = run()
    assert(builds.get() == 1)
    freshProcess()
    val dir2 = run()
    assert(builds.get() == 1, "warm-catalog rerun must not rebuild")
    assert(dir1 == dir2)
    assert(spark.read.parquet(s"$dir2/data").count() == 5)
  }

  test("a changed corpus behind the same path invalidates the artifact") {
    writeInput(10)
    val key = s"reuse_fp_${System.nanoTime}"
    val builds = new AtomicInteger(0)
    def run() = IndexCatalog.ensure(spark, key, inputs = Seq(inputDir)) { dir =>
      builds.incrementAndGet()
      spark.read.parquet(inputDir)
        .write.mode("overwrite").parquet(s"$dir/data")
    }
    run()
    assert(builds.get() == 1)
    writeInput(20) // same path, different content
    freshProcess()
    val dir = run()
    assert(builds.get() == 2, "stale artifact served for a changed corpus")
    assert(spark.read.parquet(s"$dir/data").count() == 20)
  }

  test("a missing manifest (crashed build) forces a rebuild") {
    writeInput(10)
    val key = s"reuse_crash_${System.nanoTime}"
    val builds = new AtomicInteger(0)
    def run() = IndexCatalog.ensure(spark, key, inputs = Seq(inputDir)) { dir =>
      builds.incrementAndGet()
      spark.range(3).toDF("v").write.mode("overwrite").parquet(s"$dir/data")
    }
    val dir = run()
    // simulate a crash mid-build: artifacts on disk, no commit marker
    val p = new org.apache.hadoop.fs.Path(dir, "_GRAFT_MANIFEST")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p, false))
    freshProcess()
    run()
    assert(builds.get() == 2, "half-built artifact adopted without manifest")
  }

  test("the explicit rebuild escape hatch ignores a valid manifest") {
    writeInput(10)
    val key = s"reuse_hatch_${System.nanoTime}"
    val builds = new AtomicInteger(0)
    def run() = IndexCatalog.ensure(spark, key, inputs = Seq(inputDir)) { dir =>
      builds.incrementAndGet()
      spark.range(3).toDF("v").write.mode("overwrite").parquet(s"$dir/data")
    }
    run()
    freshProcess()
    sys.props("graft.catalog.rebuild") = "1"
    try { run(); assert(builds.get() == 2, "escape hatch did not rebuild") }
    finally sys.props.remove("graft.catalog.rebuild")
  }

  test("bucketed artifact tables re-register by DDL with bucket spec intact") {
    writeInput(10)
    val key = s"reuse_tbl_${System.nanoTime}"
    val table = IndexCatalog.tableName(key)
    val builds = new AtomicInteger(0)
    def run() = IndexCatalog.ensure(spark, key, inputs = Seq(inputDir)) { dir =>
      builds.incrementAndGet()
      IndexCatalog.persistBucketedTable(
        spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v")),
        dir, table, 4, Seq("k"), Seq("k"))
    }
    run()
    val before = spark.table(table).orderBy("k").collect().toSeq
    // a fresh process has an empty metastore: drop here to simulate it
    spark.sql(s"DROP TABLE $table")
    freshProcess()
    run()
    assert(builds.get() == 1, "table artifact rebuilt instead of adopted")
    assert(spark.table(table).orderBy("k").collect().toSeq == before)
    val desc = spark.sql(s"DESCRIBE EXTENDED $table").collect().map(_.mkString("|"))
    assert(desc.exists(_.contains("Num Buckets|4")),
      s"bucket spec lost in re-registration:\n${desc.mkString("\n")}")
    assert(desc.exists(r => r.contains("Bucket Columns") && r.contains("k")))
  }

  /** The main classes dir IndexCatalog fingerprints (sbt compiles graft
    * main sources here; the suite plants/removes probe class files in it
    * to simulate a recompile-with-changes). */
  private def classesDir = new java.io.File(
    IndexCatalog.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)

  private def withPlantedClassFile(relPath: String)(body: => Unit): Unit = {
    val f = new java.io.File(classesDir, relPath)
    assert(!f.exists(), s"probe file $f already present")
    f.getParentFile.mkdirs()
    val out = new java.io.FileOutputStream(f)
    try out.write("graft fingerprint probe".getBytes("UTF-8"))
    finally out.close()
    IndexCatalog.resetCodeFingerprintMemo() // rescan, as a new deploy would
    try body
    finally {
      assert(f.delete())
      IndexCatalog.resetCodeFingerprintMemo()
    }
  }

  test("an edit to UNRELATED graft code leaves an owner-scoped artifact " +
       "adoptable, while an unscoped artifact rebuilds") {
    // round-7 verdict item 2: the repo-global code fingerprint rebuilt
    // all 14 artifacts (221 s) on a one-commit change that fed none of
    // them. Owner-scoped artifacts must survive such a commit.
    writeInput(10)
    val owners: Seq[Class[_]] = Seq(classOf[graft.plans.MinHashes])
    val keyScoped = s"reuse_scope_${System.nanoTime}"
    val keyGlobal = s"reuse_global_${System.nanoTime}"
    val builds = new AtomicInteger(0)
    def runScoped() = IndexCatalog.ensure(
      spark, keyScoped, inputs = Seq(inputDir), owners = owners) { dir =>
      builds.incrementAndGet()
      spark.range(4).toDF("v").write.mode("overwrite").parquet(s"$dir/data")
    }
    def runGlobal() = IndexCatalog.ensure(
      spark, keyGlobal, inputs = Seq(inputDir)) { dir =>
      builds.incrementAndGet()
      spark.range(4).toDF("v").write.mode("overwrite").parquet(s"$dir/data")
    }
    runScoped(); runGlobal()
    assert(builds.get() == 2)
    // "unrelated commit": a new class file that is not in the owner set
    withPlantedClassFile("graft/ZZZUnrelatedProbe.class") {
      freshProcess()
      runScoped()
      assert(builds.get() == 2,
        "owner-scoped artifact rebuilt on an unrelated-code change")
      runGlobal()
      assert(builds.get() == 3,
        "unscoped artifact must stay conservatively repo-global")
    }
  }

  test("an edit to an OWNER class invalidates the scoped artifact") {
    writeInput(10)
    val owners: Seq[Class[_]] = Seq(classOf[graft.plans.MinHashes])
    val key = s"reuse_owner_${System.nanoTime}"
    val builds = new AtomicInteger(0)
    def run() = IndexCatalog.ensure(
      spark, key, inputs = Seq(inputDir), owners = owners) { dir =>
      builds.incrementAndGet()
      spark.range(4).toDF("v").write.mode("overwrite").parquet(s"$dir/data")
    }
    run()
    assert(builds.get() == 1)
    // a recompiled owner: a fresh anonymous/lambda class under its prefix
    withPlantedClassFile("graft/plans/MinHashes$ZZZProbe.class") {
      freshProcess()
      run()
      assert(builds.get() == 2,
        "stale artifact adopted after its owner's code changed")
    }
  }

  test("ensure() builds nest: each manifest records its own table DDL") {
    // a builder that calls another artifact's accessor nests ensure();
    // the DDL buffer must save/restore, not clobber
    writeInput(10)
    val kOuter = s"reuse_nest_o_${System.nanoTime}"
    val kInner = s"reuse_nest_i_${System.nanoTime}"
    val tOuter = IndexCatalog.tableName(kOuter)
    val tInner = IndexCatalog.tableName(kInner)
    IndexCatalog.ensure(spark, kOuter, inputs = Seq(inputDir)) { dir =>
      IndexCatalog.ensure(spark, kInner, inputs = Seq(inputDir)) { idir =>
        IndexCatalog.persistBucketedTable(
          spark.range(10).select(col("id").as("k")), idir, tInner, 2, Seq("k"))
      }
      IndexCatalog.persistBucketedTable(
        spark.range(20).select(col("id").as("k")), dir, tOuter, 2, Seq("k"))
    }
    assert(spark.table(tOuter).count() == 20)
    assert(spark.table(tInner).count() == 10)
    // fresh process: BOTH artifacts re-register from their own manifests
    Seq(tOuter, tInner).foreach(t => spark.sql(s"DROP TABLE $t"))
    freshProcess()
    val n = IndexCatalog.buildCount.get()
    IndexCatalog.ensure(spark, kInner, inputs = Seq(inputDir))(_ => fail("rebuilt inner"))
    IndexCatalog.ensure(spark, kOuter, inputs = Seq(inputDir))(_ => fail("rebuilt outer"))
    assert(IndexCatalog.buildCount.get() == n)
    assert(spark.table(tOuter).count() == 20)
    assert(spark.table(tInner).count() == 10)
  }

  test("a REAL index artifact (IVF) is adopted across processes") {
    // builds (or adopts from an earlier suite) the sf0.001 IVF index,
    // then proves a fresh process serves assignments from the same
    // artifact without retraining
    IvfIndex.assignments(spark, sf0001, 8, 2).count()
    val n = IndexCatalog.buildCount.get()
    freshProcess()
    val asn = IvfIndex.assignments(spark, sf0001, 8, 2)
    assert(IndexCatalog.buildCount.get() == n,
      "IVF retrained on a warm catalog")
    assert(asn.count() == Tables.embeddings(spark, sf0001).count())
  }
}
