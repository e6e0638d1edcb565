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
  * downstream sees it. Comparison is null-safe on BOTH sides of the
  * match (`<=>`): null→value, value→null and null→null edits classify
  * correctly, and a null-valued key component matches its counterpart in
  * the other snapshot (NULL is one more key value, not an unmatchable
  * hole) — so a null-keyed row present in both snapshots classifies as
  * update/unchanged, never as a spurious delete+insert pair.
  */
object TableChanges {

  /** Change feed `before → after`. Output: key columns, `change_type`
    * (`insert` | `update` | `delete`; unchanged rows are dropped), then
    * `old_<c>`/`new_<c>` for every non-key column. Both inputs must
    * share a schema; rows are matched by `keys`, null-safely (see object
    * doc). Contract shared with any keyed diff: `keys` must identify at
    * most one row per snapshot — duplicate keys (null-keyed or not)
    * cross-match pairwise. */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(
      before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshot schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    val b = valueCols
      .foldLeft(before)((df, c) => df.withColumnRenamed(c, s"old_$c"))
      .withColumn("_in_before", lit(1))
    val a = (valueCols.map(c => (c, s"new_$c")) ++ keys.map(k => (k, s"_ak_$k")))
      .foldLeft(after) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
      .withColumn("_in_after", lit(1))
    val changed =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    // EqualNullSafe stays an equi-join key for Catalyst (shuffle hash /
    // sort-merge, never a nested-loop), so the one-shuffle scale shape
    // is unchanged; key columns coalesce back afterwards (at most one
    // side is null-row-absent per matched pair).
    b.join(a, keys.map(k => col(k) <=> col(s"_ak_$k")).reduce(_ && _), "full_outer")
      .withColumn(
        "change_type",
        when(col("_in_before").isNull, lit("insert"))
          .when(col("_in_after").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(
        keys.map(k =>
          when(col("_in_before").isNotNull, col(k)).otherwise(col(s"_ak_$k")).as(k)) ++
          (col("change_type") +:
            valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }
}
