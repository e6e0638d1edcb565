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
  /** `events.ts` has shipped as two physical types across data drops:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read as long via the legacy conf and floor-divide to micros, the
    * same truncation DuckDB applies) and plain TIMESTAMP(MICROS) without
    * UTC adjustment (which Spark reads as TIMESTAMP_NTZ). Both normalize
    * here to session-zone TimestampType at microsecond precision, so
    * every downstream operator and oracle sees one dtype regardless of
    * which generator wrote the file. Sessions must run with
    * `spark.sql.session.timeZone=UTC` (all graft entrypoints do) for the
    * NTZ→TZ cast to be the identity on the stored micros.
    *
    * SESSION-WIDE SIDE EFFECT (deliberate): this sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the shared session
    * and leaves it set — the conf is consulted at ACTION time, not at
    * `read.parquet` time, so a set-and-restore around this lazy call
    * would break execution of the returned frame. Consequence: any later
    * nanos-timestamp parquet read in the same session also surfaces as
    * long. Every graft read path goes through [[Tables]], which applies
    * the matching conversion, so inside the library the setting is
    * invisible; sessions mixing graft with external nanos reads must
    * apply the same conversion.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) surfaced as long nanos
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case TimestampNTZType => // micros: reinterpret in the (UTC) session zone
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other => // anything else means a malformed data drop: fail at
        // read time, not as subtly wrong timestamps downstream
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected TIMESTAMP, " +
            "TIMESTAMP_NTZ, or nanos-as-long)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
