package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation by key salting (SURVEY §"Optimize for scale").
  *
  * A single hot key turns a hash-aggregation or join shuffle into one
  * straggler task. Salting splits each key into `nSalts` sub-keys for a
  * first partial aggregate, then merges the partials in a second, tiny
  * aggregate. Deterministic salt (derived from a row id) keeps results
  * reproducible and oracle-checkable; results are IDENTICAL to the
  * unsalted aggregation — only the shuffle layout changes.
  *
  * (AQE's skewedJoin handles skewed *joins* automatically; salting
  * remains the tool for skewed *aggregations* with algebraic merges.)
  */
object Salting {

  /** Deterministic salt in [0, nSalts) from a unique row id. */
  def salt(rowId: Column, nSalts: Int): Column = pmod(rowId, lit(nSalts))

  /** Two-stage salted count+sum aggregation: equivalent to
    * `df.groupBy(key).agg(count, sum(valueCol))` under any skew. */
  def saltedCountSum(df: DataFrame, key: String, rowId: String,
                     valueCol: Column, nSalts: Int = 16): DataFrame =
    df.groupBy(col(key), salt(col(rowId), nSalts).as("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
}
