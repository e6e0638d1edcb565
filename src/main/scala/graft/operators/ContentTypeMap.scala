package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AppName → content-type mapping (reference semantics at
  * ETL_customer_interaction.py:10-21, SURVEY §2.8 C1 + §2.2 F1/F2).
  *
  * Data-driven: the mapping lives in a table and folds into a literal
  * when-chain (codegen'd, no join, no UDF). Matching is case-SENSITIVE —
  * the reference enumerates both `KPLUS` and `KPlus` deliberately; an
  * unknown AppName maps to "Error" and is filtered, never a new column
  * (pivot schema stability, SURVEY §7.4 risk 4).
  */
object ContentTypeMap {

  /** Content-type values, in the canonical (alphabetical-Vietnamese)
    * order used by pivots and the taste string. */
  val ContentTypes: Seq[String] =
    Seq("Giai Tri", "Phim Truyen", "The Thao", "Thieu Nhi", "Truyen Hinh")

  /** The mapping table (app keys are case-sensitive). */
  val Mapping: Map[String, String] = Map(
    "CHANNEL" -> "Truyen Hinh", "DSHD" -> "Truyen Hinh",
    "KPLUS" -> "Truyen Hinh", "KPlus" -> "Truyen Hinh",
    "VOD" -> "Phim Truyen", "FIMS_RES" -> "Phim Truyen",
    "BHD_RES" -> "Phim Truyen", "VOD_RES" -> "Phim Truyen",
    "FIMS" -> "Phim Truyen", "BHD" -> "Phim Truyen", "DANET" -> "Phim Truyen",
    "RELAX" -> "Giai Tri",
    "CHILD" -> "Thieu Nhi",
    "SPORT" -> "The Thao")

  val Unmapped = "Error"

  /** The mapping as a single codegen'd column expression. Chain order
    * follows the reference's when-chain (Truyen Hinh, Phim Truyen,
    * Giai Tri, Thieu Nhi, The Thao) — irrelevant for a function-shaped
    * mapping but kept for exact plan parity. */
  def typeColumn(appName: Column): Column = {
    val groups = Seq("Truyen Hinh", "Phim Truyen", "Giai Tri", "Thieu Nhi", "The Thao")
    groups.foldRight(lit(Unmapped): Column) { (t, rest) =>
      val apps = Mapping.collect { case (app, tt) if tt == t => app }.toSeq.sorted
      when(appName.isInCollection(apps), t).otherwise(rest)
    }
  }

  /** Full C1+F1+F2 stage: map, project, drop sentinel contracts and
    * unmapped rows. NOTE `Contract != '0'` also drops NULL contracts
    * (SQL 3VL) — required reference behavior. */
  def apply(df: DataFrame): DataFrame =
    df.withColumn("Type", typeColumn(col("AppName")))
      .select("Contract", "Type", "TotalDuration", "log_date")
      .filter(col("Contract") =!= "0")
      .filter(col("Type") =!= Unmapped)
}
