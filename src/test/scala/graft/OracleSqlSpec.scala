package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[OracleSql.materializeCtes]] rewrite — the round-18 fix
  * for the empty driver correctness artifact (CORRECTNESS_r17 = `{}`):
  * DuckDB 1.x inlines CTEs, so the doubly-referenced iterative chains
  * (the BPE loop's `v{k}`, the funnel's per-stage `lvl` reads)
  * re-evaluate exponentially; the `AS MATERIALIZED` hint pins one
  * evaluation per CTE with bit-identical results (measured:
  * q_bpe_merges 130 s → 0.16 s at sf0.01; full registry re-verified
  * value-identical before adoption).
  *
  * No Spark session needed — this audits SQL text. */
class OracleSqlSpec extends AnyFunSuite {

  private val plainDecl = """(?<!WINDOW )\b\w+ AS \(""".r
  private val recDecl = """\w+\([\w, ]*\) AS \(""".r

  test("every plain CTE declaration in the dumped registry is materialized") {
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if plainDecl.findFirstIn(sql).isDefined => name
    }
    assert(bad.isEmpty,
      s"un-materialized CTE declarations survive the rewrite in: $bad")
  }

  test("named-window clauses keep their bare form") {
    // `WINDOW w AS (` is not a CTE; DuckDB rejects MATERIALIZED there
    // (q_ewma was the catch during adoption)
    val winDecl = """WINDOW \w+ AS \(""".r
    val withWindow = SparkEntry.oracleSql.filter(_._2.contains("WINDOW "))
    assert(withWindow.nonEmpty, "registry lost its named-window oracles?")
    withWindow.foreach { case (name, sql) =>
      assert(winDecl.findFirstIn(sql).isDefined,
        s"$name: named-window clause was rewritten")
    }
  }

  test("recursive members (column-list declarations) are left untouched") {
    // the walk CTEs must keep their bare `name(cols) AS (` form: DuckDB
    // rejects MATERIALIZED on a recursive member, and the rewrite's
    // \w+-only capture can never match a name followed by a paren list
    val withRec = SparkEntry.oracleSql.filter(_._2.contains("RECURSIVE"))
    assert(withRec.nonEmpty, "registry lost its recursive oracles?")
    withRec.foreach { case (name, sql) =>
      recDecl.findAllIn(sql).foreach { decl =>
        assert(!decl.contains("MATERIALIZED"),
          s"$name: recursive member rewritten: $decl")
      }
    }
  }

  test("rewrite is idempotent and count-preserving") {
    val raw = SparkEntry.all.flatMap(_.oracle)
    raw.foreach { sql =>
      val once = OracleSql.materializeCtes(sql)
      assert(OracleSql.materializeCtes(once) == once, "rewrite not idempotent")
      val before = plainDecl.findAllIn(sql).length
      val after = "AS MATERIALIZED \\(".r.findAllIn(once).length -
        "AS MATERIALIZED \\(".r.findAllIn(sql).length
      assert(after == before,
        s"rewrite count mismatch: $before plain decls, $after hints added")
    }
  }

  test("no oracle string literal contains the declaration pattern") {
    // the rewrite is textual; a quoted literal like 'x AS (' would be
    // corrupted silently. Audit every single-quoted literal in the raw
    // registry text.
    val lit = """'[^']*'""".r
    SparkEntry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach {
      case (name, sql) =>
        lit.findAllIn(sql).foreach { l =>
          assert(plainDecl.findFirstIn(l).isEmpty,
            s"$name: string literal matches the CTE-decl pattern: $l")
        }
    }
  }
}
