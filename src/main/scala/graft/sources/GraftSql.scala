package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-text entry point: registers the engine's tables as temp views and
  * runs `spark.sql`. Queries written in the common ANSI subset (explicit
  * decimal casts, standard joins/windows/grouping-sets) execute
  * unchanged on Spark AND on the DuckDB oracle — the same string is both
  * implementation and oracle. */
object GraftSql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all tables from `dir` as temp views (idempotent).
    * `events` goes through the nanos-converting reader. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    TableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t        => Tables(spark, dir, t).createOrReplaceTempView(t)
    }

  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(sql)
  }
}
