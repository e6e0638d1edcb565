package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens

/** Storage-layout operators: Z-order (Morton-curve) clustering and its
  * data-skipping audit — the table-maintenance pass a 100 TB lake runs
  * so that multi-dimensional point predicates prune FILES, not rows
  * (the Delta/Iceberg `OPTIMIZE ZORDER` idea, public since Morton 1966
  * and the Hudi/Delta layout papers).
  *
  * Two dimensions with real query predicates stand in for the general
  * case: a 5-bit source code (`u32(md5('zl|'||source)) % 32` — the
  * house engine-independent hash; collisions merely share a code and
  * cost a few extra scanned files, exactly as in production) and a
  * 5-bit token-length band (`least(toks div 16, 31)`). The Morton key
  * interleaves the two bit streams; FILES are the 64 coarse z-cells
  * (`z div 16`) — cell assignment is a pure per-row map, so the layout
  * pass is embarrassingly parallel (no global sort, no single-reducer
  * window; real optimizers range-partition by the same key).
  *
  * The audit query scores the layout the way an engine's file-skipping
  * does: a file is SCANNED for predicate `source = s` iff its
  * [min,max] source-code range contains code(s). The linear
  * (insertion-order) baseline applies the SAME range semantics to
  * doc_id-contiguous files, so the comparison isolates the layout, not
  * the metadata scheme. Everything is integer-exact.
  */
object LayoutQueries {

  private val W = """string_split_regex(trim(text), '\s+')"""
  private val Bits = 5          // per-dimension resolution
  private val CellShift = 16L   // file = z div 16 -> 64 coarse cells
  private val NFiles = 64L      // linear-baseline file count (matches)

  /** Morton key: the shared [[graft.plans.ZOrder]] primitive (the one
    * `q_zorder_key`/`q_zorder3` already pin), d2 on even bit positions
    * and d1 on odd — one interleave definition across the repo. */
  private def zKeySql(d1: String, d2: String): String =
    graft.plans.ZOrder.zSql(d2, d1, Bits)

  /** Linear-baseline file id over a CTE named `t`: doc_id-contiguous
    * files of ceil(n/$NFiles) rows — ONE definition shared by both
    * audits so the baselines cannot desynchronize. */
  private def linFileSql: String =
    s"doc_id // ((SELECT (count(*) + $NFiles - 1) // $NFiles FROM t))"

  /** Spark twin of [[linFileSql]]: adds an `lfile` column (the per-file
    * row budget is a ONE-row global agg broadcast onto the frame). */
  private def withLinFile(cells: DataFrame): DataFrame = {
    val n1 = cells.agg(
      expr(s"(count(*) + $NFiles - 1) div $NFiles").as("per_file"))
    cells.crossJoin(broadcast(n1))
      .withColumn("lfile", expr("doc_id div per_file"))
      .drop("per_file")
  }

  /** Spark column for the 5-bit source code. */
  private def srcCode: org.apache.spark.sql.Column =
    (conv(substring(md5(concat(lit("zl|"), col("source"))), 1, 8), 16, 10)
      .cast("long") % 32).as("d1")

  private def srcCodeSql = s"${DsirQueries.hexU8("md5('zl|' || source)")} % 32"

  /** Per-file layout statistics: how tightly the z-cells bound each
    * dimension — the min/max metadata an engine skips files with. */
  val zorderLayout = Q(
    "q_zorder_layout",
    s"""WITH t AS (
       |  SELECT doc_id,
       |    $srcCodeSql AS d1,
       |    least(CAST(len($W) AS BIGINT) // 16, 31) AS d2
       |  FROM documents
       |), z AS (
       |  SELECT doc_id, d1, d2, ${zKeySql("d1", "d2")} AS zv FROM t
       |)
       |SELECT zv // $CellShift AS file_id, count(*) AS n_docs,
       |  min(d1) AS d1_min, max(d1) AS d1_max,
       |  min(d2) AS d2_min, max(d2) AS d2_max
       |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin) { (s, d) =>
    zcells(s, d)
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_docs"),
        min("d1").as("d1_min"), max("d1").as("d1_max"),
        min("d2").as("d2_min"), max("d2").as("d2_max"))
      .orderBy("file_id")
  }

  /** (doc_id, source, d1, d2, zv, file_id) — the layout assignment
    * over any (doc_id, source, text) frame; shared by the stats and
    * audit queries AND the on-arrival twin
    * ([[graft.streaming.LayoutStreams]]) so batch and stream can never
    * assign a document to different cells. */
  private[graft] def zcellsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), srcCode,
        size(tokens(col("text"))).cast("long").as("toks"))
      .withColumn("d2", expr("least(toks div 16, 31)"))
      .withColumn("zv", graft.plans.ZOrder.zValue(col("d2"), col("d1"), Bits))
      .withColumn("file_id", expr(s"zv div $CellShift"))
      .drop("toks")

  private def zcells(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    zcellsOf(Tables.documents(s, d))

  /** Data-skipping audit: files scanned for `source = s` under the
    * z-order layout vs the insertion-order baseline, SAME min/max range
    * semantics. The linear baseline's files are doc_id-contiguous
    * (`doc_id div ceil(n/$NFiles)`). */
  val zorderPrune = Q(
    "q_zorder_prune",
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    $srcCodeSql AS d1,
       |    least(CAST(len($W) AS BIGINT) // 16, 31) AS d2
       |  FROM documents
       |), z AS (
       |  SELECT doc_id, source, d1, ${zKeySql("d1", "d2")} AS zv FROM t
       |), zf AS (
       |  SELECT zv // $CellShift AS file_id, min(d1) AS lo, max(d1) AS hi
       |  FROM z GROUP BY file_id
       |), lf AS (
       |  SELECT $linFileSql AS file_id,
       |    min(d1) AS lo, max(d1) AS hi
       |  FROM t GROUP BY file_id
       |), srcs AS (SELECT source, min(d1) AS code FROM t GROUP BY source)
       |SELECT s.source, s.code,
       |  (SELECT CAST(count(*) AS BIGINT) FROM zf
       |   WHERE s.code BETWEEN zf.lo AND zf.hi) AS z_files,
       |  (SELECT CAST(count(*) AS BIGINT) FROM lf
       |   WHERE s.code BETWEEN lf.lo AND lf.hi) AS lin_files,
       |  (SELECT CAST(count(*) AS BIGINT) FROM zf) AS z_total,
       |  (SELECT CAST(count(*) AS BIGINT) FROM lf) AS lin_total
       |FROM srcs s ORDER BY s.source""".stripMargin) { (s, d) =>
    val cells = zcells(s, d)
    val zf = cells.groupBy("file_id")
      .agg(min("d1").as("lo"), max("d1").as("hi"))
    val lf = withLinFile(cells)
      .groupBy(col("lfile").as("file_id"))
      .agg(min("d1").as("lo"), max("d1").as("hi"))
    val srcs = cells.groupBy("source").agg(min("d1").as("code"))
    // files-scanned counts: |sources| × |files| metadata joins — both
    // sides are bounded derived frames (≤64 rows and ≤|sources| rows);
    // no static broadcast hint (grouped-agg sides are formally
    // unbounded to the hygiene rule) — AQE broadcasts the ≤64-row side
    val zc = srcs.join(zf,
        col("code").between(col("lo"), col("hi")), "left")
      .groupBy("source", "code").agg(count(col("lo")).as("z_files"))
    val lc = srcs.join(lf,
        col("code").between(col("lo"), col("hi")), "left")
      .groupBy("source", "code").agg(count(col("lo")).as("lin_files"))
    val tot = zf.agg(count(lit(1)).as("z_total"))
      .crossJoin(lf.agg(count(lit(1)).as("lin_total")))
    zc.join(lc, Seq("source", "code"))
      .crossJoin(broadcast(tot))
      .select("source", "code", "z_files", "lin_files", "z_total", "lin_total")
      .orderBy("source")
  }

  // ------------------------------------------------------------------
  // Hilbert curve — the locality-optimal alternative
  // ------------------------------------------------------------------

  /** One Hilbert xy→d iteration per CTE, 5 unrolled (the canonical
    * quadrant-rotation recurrence, Hilbert 1891 / the public xy2d
    * form): quadrant digit `(3·rx) XOR ry` spelled as a CASE, then the
    * rotation (ry=0 ∧ rx=1 → flip both against n−1 and swap; ry=0 ∧
    * rx=0 → swap; ry=1 → identity). `div` is the integer-divide
    * spelling per engine. Emits CTEs `h0..h4` from a base CTE
    * `hb(doc_id, source, x, y, d)`; the Hilbert index is `h4.d`. */
  private def hilbertCtes(div: String): String =
    Seq(16, 8, 4, 2, 1).zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) "hb" else s"h${i - 1}"
      s"""h$i AS (
         |  SELECT doc_id, source,
         |    d + ${s * s} * (CASE WHEN (x $div $s) % 2 = 0
         |                         THEN (y $div $s) % 2
         |                         ELSE 3 - (y $div $s) % 2 END) AS d,
         |    CASE WHEN (y $div $s) % 2 = 1 THEN x
         |         WHEN (x $div $s) % 2 = 1 THEN 31 - y ELSE y END AS x,
         |    CASE WHEN (y $div $s) % 2 = 1 THEN y
         |         WHEN (x $div $s) % 2 = 1 THEN 31 - x ELSE x END AS y
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")

  /** Spark twin of [[hilbertCtes]]: folds the 5 iterations over
    * (d1, d2) columns, leaving a `hd` Hilbert-index column. */
  private[operators] def hilbertCol(df: DataFrame): DataFrame =
    Seq(16, 8, 4, 2, 1).foldLeft(
      df.withColumn("hx", col("d1")).withColumn("hy", col("d2"))
        .withColumn("hd", lit(0L))) { (acc, s) =>
      acc
        .withColumn("hd", expr(
          s"""hd + ${s * s} * (CASE WHEN (hx div $s) % 2 = 0
             |                      THEN (hy div $s) % 2
             |                      ELSE 3 - (hy div $s) % 2 END)""".stripMargin))
        .withColumn("nhx", expr(
          s"""CASE WHEN (hy div $s) % 2 = 1 THEN hx
             |     WHEN (hx div $s) % 2 = 1 THEN 31 - hy ELSE hy END"""
            .stripMargin))
        .withColumn("nhy", expr(
          s"""CASE WHEN (hy div $s) % 2 = 1 THEN hy
             |     WHEN (hx div $s) % 2 = 1 THEN 31 - hx ELSE hx END"""
            .stripMargin))
        .drop("hx", "hy")
        .withColumnRenamed("nhx", "hx").withColumnRenamed("nhy", "hy")
    }

  private def hbSql =
    s"""hb AS (
       |  SELECT doc_id, source,
       |    $srcCodeSql AS x,
       |    least(CAST(len($W) AS BIGINT) // 16, 31) AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM documents
       |)""".stripMargin

  /** Per-file stats of the Hilbert layout — same 64-cell file grain as
    * [[zorderLayout]], so the two curves compare like for like. */
  val hilbertLayout = Q(
    "q_hilbert_layout",
    s"""WITH $hbSql,
       |${hilbertCtes("//")},
       |cells AS (
       |  SELECT hb.doc_id, hb.x AS d1, hb.y AS d2, h4.d // $CellShift AS file_id
       |  FROM hb JOIN h4 USING (doc_id)
       |)
       |SELECT file_id, count(*) AS n_docs,
       |  min(d1) AS d1_min, max(d1) AS d1_max,
       |  min(d2) AS d2_min, max(d2) AS d2_max
       |FROM cells GROUP BY file_id ORDER BY file_id""".stripMargin) { (s, d) =>
    hilbertCol(zcells(s, d).select("doc_id", "source", "d1", "d2"))
      .withColumn("file_id", expr(s"hd div $CellShift"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_docs"),
        min("d1").as("d1_min"), max("d1").as("d1_max"),
        min("d2").as("d2_min"), max("d2").as("d2_max"))
      .orderBy("file_id")
  }

  /** Three-way locality comparison — one row per layout with the
    * numbers an engine's file-skipping feels: file count, the summed
    * per-file code-range width of each dimension (smaller = tighter
    * min/max metadata = fewer false-positive file scans), and the
    * largest file. The linear baseline uses the SAME doc_id-contiguous
    * files as [[zorderPrune]]. */
  val curveCompare = Q(
    "q_curve_compare",
    s"""WITH $hbSql,
       |${hilbertCtes("//")},
       |t AS (SELECT doc_id, x AS d1, y AS d2 FROM hb),
       |hz AS (
       |  SELECT t.doc_id, t.d1, t.d2,
       |    h4.d // $CellShift AS hfile,
       |    (${zKeySql("t.d1", "t.d2")}) // $CellShift AS zfile,
       |    $linFileSql AS lfile
       |  FROM t JOIN h4 USING (doc_id)
       |), per AS (
       |  SELECT 'hilbert' AS layout, hfile AS file_id, count(*) AS n,
       |    max(d1) - min(d1) + 1 AS s1, max(d2) - min(d2) + 1 AS s2,
       |    min(d1) AS m1, min(d2) AS m2
       |  FROM hz GROUP BY hfile
       |  UNION ALL
       |  SELECT 'linear', lfile, count(*),
       |    max(d1) - min(d1) + 1, max(d2) - min(d2) + 1,
       |    min(d1), min(d2)
       |  FROM hz GROUP BY lfile
       |  UNION ALL
       |  SELECT 'zorder', zfile, count(*),
       |    max(d1) - min(d1) + 1, max(d2) - min(d2) + 1,
       |    min(d1), min(d2)
       |  FROM hz GROUP BY zfile
       |), sp AS (
       |  SELECT layout, n, s1, s2,
       |    coalesce(abs(m1 - lag(m1) OVER w) + abs(m2 - lag(m2) OVER w), 0)
       |      AS seam
       |  FROM per WINDOW w AS (PARTITION BY layout ORDER BY file_id)
       |)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(s1) AS BIGINT) AS d1_span_mass,
       |  CAST(sum(s2) AS BIGINT) AS d2_span_mass,
       |  CAST(sum(seam) AS BIGINT) AS seam_mass,
       |  CAST(max(n) AS BIGINT) AS max_file_docs
       |FROM sp GROUP BY layout ORDER BY layout""".stripMargin) { (s, d) =>
    val base = hilbertCol(zcells(s, d)
      .select("doc_id", "source", "d1", "d2", "file_id")
      .withColumnRenamed("file_id", "zfile"))
      .withColumn("hfile", expr(s"hd div $CellShift"))
    val hz = withLinFile(base)
    def sideOf(tag: String, fileCol: String) =
      hz.groupBy(col(fileCol).as("file_id"))
        .agg(count(lit(1)).as("n"),
          (max("d1") - min("d1") + 1).as("s1"),
          (max("d2") - min("d2") + 1).as("s2"),
          min("d1").as("m1"), min("d2").as("m2"))
        .withColumn("layout", lit(tag))
    val per = sideOf("hilbert", "hfile")
      .unionByName(sideOf("linear", "lfile"))
      .unionByName(sideOf("zorder", "zfile"))
    // seam: how far apart consecutive occupied files sit in key space —
    // the curve-order locality z trades away (long diagonal jumps) and
    // Hilbert keeps (unit steps); window partitioned by layout (3 small
    // groups), never corpus-sized
    val w = Window.partitionBy("layout").orderBy("file_id")
    val sp = per.withColumn("seam",
      coalesce(abs(col("m1") - lag("m1", 1).over(w)) +
        abs(col("m2") - lag("m2", 1).over(w)), lit(0L)))
    sp.groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        sum("s1").as("d1_span_mass"), sum("s2").as("d2_span_mass"),
        sum("seam").as("seam_mass"),
        max("n").as("max_file_docs"))
      .orderBy("layout")
  }
}
