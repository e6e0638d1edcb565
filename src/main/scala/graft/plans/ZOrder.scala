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

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: x occupies even result bits, y odd. Codegen'd shift/and/or
    * chain — no UDF. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as a DuckDB/ANSI SQL fragment over column
    * expressions `x` and `y` — kept textually parallel to [[zValue]] so
    * the oracle computes bit-identical values. */
  def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", ") | (", ")")

  /** Write `df` in z-order layout: range-partition by the interleaved
    * value into `nFiles` files and sort within each — every output file
    * then covers a contiguous z-range, i.e. a tight (x, y) bounding box
    * for footer-stats pruning. The helper column never reaches disk. */
  def writeLayout(df: DataFrame, x: Column, y: Column, bits: Int,
                  nFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
