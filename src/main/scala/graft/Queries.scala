package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's query surface.
  *
  * @param name   stable id (keys CORRECTNESS_r{N}.json)
  * @param run    Spark-side implementation over the sf-dir parquet tables
  * @param oracle equivalent DuckDB SQL over the same tables; None for
  *               operators whose semantics aren't ANSI-SQL-expressible
  *               (driver then records a weaker rows-only check)
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
