package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-user most-searched keyword (pipeline B: SURVEY §2.4 A1 + §2.5 W1 +
  * §2.2 F3).
  *
  * Two deliberate parity deltas, both documented in SURVEY §2.5/§4:
  *  - the reference's global `orderBy(count desc)` before the window is
  *    semantically dead (row_number ignores input order) and costs a full
  *    range-partition shuffle — omitted;
  *  - the reference's `row_number` over (count desc) alone is
  *    NONDETERMINISTIC on tied counts — the engine adds `keyword` as an
  *    explicit tie-break so results are stable run-to-run.
  */
object TopKeyword {

  def apply(searchLogs: DataFrame, outName: String = "most_search"): DataFrame = {
    val counts = searchLogs
      .groupBy("user_id", "keyword")
      .agg(count(lit(1)).as("count"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("count").desc, col("keyword").asc_nulls_last)
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("user_id"), col("keyword").as(outName))
  }
}
