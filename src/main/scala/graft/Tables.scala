package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated parquet tables
  * (`/root/testdata/sf{N}/<name>.parquet`, schemas in FIXTURES.md §B).
  *
  * One multi-path-capable read per table — never a per-day union loop
  * (the reference's accumulation anti-pattern at
  * ETL_customer_interaction.py:89-92 / ETL_customer_behavior.py:170-181).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a long (legacy conf) and floor-divide to
    * microseconds — the same truncation DuckDB applies when it loads a
    * nanosecond timestamp, so oracle comparisons stay exact.
    *
    * SESSION-WIDE SIDE EFFECT (deliberate): this sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the shared session
    * and leaves it set — the conf is consulted at ACTION time, not at
    * `read.parquet` time, so a set-and-restore around this lazy call
    * would break execution of the returned frame. Consequence: any later
    * nanos-timestamp parquet read in the same session also surfaces as
    * long. Every graft read path goes through [[Tables]], which applies
    * the matching `ts div 1000` conversion, so inside the library the
    * setting is invisible; sessions mixing graft with external nanos
    * reads must apply the same conversion.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
