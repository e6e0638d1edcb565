package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row with the same key and `rightTime <= leftTime`. Spark has no
  * native as-of join; the naive range join explodes to |L|×|R| per key.
  *
  * Technique: tag and union both sides, then one window pass per key in
  * time order carrying the last non-null right payload
  * (`last(_, ignoreNulls = true)` over an unbounded-preceding frame).
  * Cost: ONE shuffle+sort by key — the same shape as a window
  * aggregation, independent of match distances, so it scales to
  * arbitrarily long histories. Right rows sort before left rows at
  * equal timestamps (inclusive `>=` semantics, matching DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t` oracle); duplicate (key, rightTime)
  * rows resolve deterministically to the greatest first-payload value.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (null when no match). */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = struct(payload.map(col): _*)

    val taggedRight = right.select(
      Seq(col(key), col(rightTime).as("_t"), lit(0).as("_side"),
          pay.as("_pay")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast(taggedRight.schema("_pay").dataType).as("_pay")) ++
        leftCols.filterNot(_ == key).map(col): _*)

    // tie-break on the first payload column: with duplicate
    // (key, rightTime) rows the greatest payload value wins,
    // deterministically (left rows sort after all right rows at the
    // same instant via _side regardless of their null tie-break)
    val w = Window.partitionBy(key)
      .orderBy(col("_t"), col("_side"), col("_pay").getField(payload.head))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_match.$p").as(p)): _*)
  }
}
