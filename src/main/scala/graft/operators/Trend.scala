package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Month-over-month trend derivation (pipeline B tail: SURVEY §2.3 J1 +
  * §2.8 C6/C7).
  *
  * 3VL quirks preserved exactly (SURVEY §7.4 risk 3): with a NULL
  * category on either side, `Trending_Type` falls through to "Changed"
  * (NULL condition → otherwise) while `Category_Change` falls through to
  * "Unchanged" — asymmetric on purpose, because the reference is.
  */
object Trend {

  /** Inner USING-join of the June and July profiles + trend columns.
    * Expected inputs: (user_id, most_search_T6, category_T6) and
    * (user_id, most_search_T7, category_T7). */
  def apply(june: DataFrame, july: DataFrame): DataFrame =
    june.join(july, Seq("user_id"), "inner")
      .withColumn("Trending_Type",
        when(col("category_T6") === col("category_T7"), "Unchanged")
          .otherwise("Changed"))
      .withColumn("Category_Change",
        when(col("category_T6") =!= col("category_T7"),
             concat_ws("-", col("category_T6"), col("category_T7")))
          .otherwise("Unchanged"))
      .select("user_id",
        "most_search_T6", "category_T6",
        "most_search_T7", "category_T7",
        "Trending_Type", "Category_Change")
}
