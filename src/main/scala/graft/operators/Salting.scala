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

  /** Salted equi-join for a skewed FACT key against a dim too large to
    * broadcast: the fact side gets a deterministic salt from its row
    * id; the dim side is replicated once per salt value; the join key
    * becomes `(key, salt)`, so one hot key spreads over `nSalts` shuffle
    * partitions instead of one straggler task. Result is IDENTICAL to
    * `fact JOIN dim ON factKey = dimKey` — every fact row still meets
    * its dim row (in exactly one salt lane), only the shuffle layout
    * changes. Cost: the dim shuffle grows ×nSalts — worth it only when
    * fact skew dominates (AQE's skew-join split is the automatic
    * alternative; salting is the explicit-control version that also
    * works for shuffle-hash joins and under AQE-off). */
  def saltedJoin(fact: DataFrame, factKey: String, rowId: String,
                 dim: DataFrame, dimKey: String, nSalts: Int = 8): DataFrame = {
    val f = fact.withColumn("_fsalt", salt(col(rowId), nSalts))
    val dRep = dim.withColumn("_dsalt",
      explode(array((0 until nSalts).map(lit(_)): _*)))
    f.join(dRep,
        col(factKey) === col(dimKey) && col("_fsalt") === col("_dsalt"))
      .drop("_fsalt", "_dsalt")
  }
}
