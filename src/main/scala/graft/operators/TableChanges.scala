package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based snapshot diff — the CDC **read** side of the warehouse tier.
  *
  * [[graft.sources.GenerationedTable]] and [[graft.sources.LogTable]]
  * give every table a history of complete keyed snapshots; `diff` turns
  * any two of them into a change feed (`insert` / `update` / `delete`
  * rows with old/new values side by side), which is what an incremental
  * downstream job consumes instead of re-reading the world — the
  * generation-pointer twin of a transactional format's change-data feed.
  *
  * Scale design: ONE full-outer shuffle join on the key columns and a
  * row-local classification — no windows, no collect. At 100 TB both
  * snapshots come off the same bucketed layout (generations of one table
  * share their write path), so the join plans with zero Exchanges, and
  * the unchanged majority of a daily diff is dropped before anything
  * downstream sees it. Value comparison is null-safe (`<=>`), so
  * null→value, value→null and null→null edits classify correctly.
  */
object TableChanges {

  /** Change feed `before → after`. Output: key columns, `change_type`
    * (`insert` | `update` | `delete`; unchanged rows are dropped), then
    * `old_<c>`/`new_<c>` for every non-key column. Both inputs must
    * share a schema; rows are matched by `keys`. */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(
      before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshot schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    val b = valueCols
      .foldLeft(before)((df, c) => df.withColumnRenamed(c, s"old_$c"))
      .withColumn("_in_before", lit(1))
    val a = valueCols
      .foldLeft(after)((df, c) => df.withColumnRenamed(c, s"new_$c"))
      .withColumn("_in_after", lit(1))
    val changed =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    b.join(a, keys, "full_outer")
      .withColumn(
        "change_type",
        when(col("_in_before").isNull, lit("insert"))
          .when(col("_in_after").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(
        keys.map(col) ++ (col("change_type") +:
          valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }
}
