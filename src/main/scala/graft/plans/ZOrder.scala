package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve primitives for multi-dimensional data layout.
  *
  * At 100 TB, sorting a table by ONE key gives perfect file-level
  * min/max pruning on that key and none on any other; interleaving the
  * bits of two keys and range-partitioning by the interleaved value
  * gives each file a tight bounding BOX in both dimensions, so a scan
  * filtered on either key (or both) can skip most files from footer
  * statistics alone — the layout trick behind Delta/Iceberg OPTIMIZE
  * ZORDER, expressed here as plain Spark expressions + repartitionByRange.
  *
  * The bit-interleave is closed-form integer arithmetic (shift/and/or),
  * identical in Spark and ANSI SQL — so z-values are oracle-checkable. */
object ZOrder {

  /** Morton-interleave the low `bits` bits of N non-negative integer
    * columns, round-robin: bit `b` of column `i` lands at result
    * position `b·n + i`. Codegen'd shift/and/or chain — no UDF. N·bits
    * must fit a long (≤ 63). */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2 && n * bits <= 63, s"need 2+ columns and n*bits <= 63")
    // Cast to long FIRST: shiftleft preserves the input type, so an
    // IntegerType column would silently wrap for result positions >= 31.
    (for { b <- 0 until bits; (c, i) <- cols.zipWithIndex }
      yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_ bitwiseOR _)
  }

  /** Two-column form (x even bits, y odd) — delegates to [[zValueN]]. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** The same interleave as a DuckDB/ANSI SQL fragment over column
    * expressions — kept textually parallel to [[zValueN]] so the oracle
    * computes bit-identical values. */
  def zSqlN(xs: Seq[String], bits: Int): String = {
    val n = xs.size
    (for { b <- 0 until bits; (x, i) <- xs.zipWithIndex }
      yield s"((($x >> $b) & 1) << ${b * n + i})")
      .mkString("(", ") | (", ")")
  }

  def zSql(x: String, y: String, bits: Int): String = zSqlN(Seq(x, y), bits)

  /** Write `df` in z-order layout: range-partition by the interleaved
    * value into `nFiles` files and sort within each — every output file
    * then covers a contiguous z-range, i.e. a tight (x, y) bounding box
    * for footer-stats pruning. The helper column never reaches disk. */
  def writeLayout(df: DataFrame, x: Column, y: Column, bits: Int,
                  nFiles: Int, path: String): Unit =
    writeLayoutN(df, Seq(x, y), bits, nFiles, path)

  /** N-dimensional layout: every output file covers a contiguous
    * z-range, i.e. a tight bounding box in ALL interleaved dimensions. */
  def writeLayoutN(df: DataFrame, cols: Seq[Column], bits: Int,
                   nFiles: Int, path: String): Unit =
    df.withColumn("__z", zValueN(cols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
