#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle_sql.json entry in DuckDB (tables = views over the sf-dir
parquet files), loads the matching Spark result parquet, and compares:
column names (sorted), row counts, and cell values (rows sorted). ALL
comparisons are bit-exact BY DESIGN — floats via float.hex(), matching the
driver's hash gate: registered queries are required to produce
deterministic, engine-identical float64 bits (exact decimal internals,
final DOUBLE casts), so a last-ulp divergence is a real defect, not noise.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", v.hex())
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("d", str(v.normalize()))
    except Exception:
        pass
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return (type(v).__name__, str(v))

"""Type audit (round-13 root cause): the DRIVER's hash gate is TYPE-
SENSITIVE in a way norm() above is not — an uncast DuckDB `sum(BIGINT)`
(→ HUGEINT) hashes red in the driver even when every value compares
equal here (q_quality_tertiles was red for three rounds on exactly
this). So beyond values we compare each oracle output column's DuckDB
type against the Spark parquet dump's type (as DuckDB reads the dump)
and FAIL on any divergence of HASH CLASS. Classes group types the
driver's value rendering provably cannot distinguish — the plain
integer widths (TINYINT..BIGINT: 24 registry queries pair oracle BIGINT
with a Spark int32 dump and are green in the driver's gate) — while
everything outside the 64-bit lane (HUGEINT, UHUGEINT, UBIGINT,
DECIMAL) is its own class: those take a different conversion path in
the driver (128-bit / decimal → object or float dtype) and hash red on
identical values. FLOAT vs DOUBLE also stay distinct (float32
re-rendering diverges in the last ulps)."""

_INT_CLASS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER"}

def hash_class(t):
    t = str(t).upper()
    if t in _INT_CLASS:
        return "INT64LANE"
    if t.endswith("[]"):
        return hash_class(t[:-2]) + "[]"
    return t  # HUGEINT, DECIMAL(p,s), DOUBLE, FLOAT, VARCHAR, ... verbatim

def type_names(rel):
    return {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}

def audit_types(con, name, sql, files):
    """Return list of 'col: oracle TYPE vs spark TYPE' divergences."""
    want_t = type_names(con.sql(sql))
    got_t = type_names(con.sql(f"SELECT * FROM read_parquet({files!r})"))
    bad = []
    for c, wt in want_t.items():
        gt = got_t.get(c)
        if gt is not None and hash_class(wt) != hash_class(gt):
            bad.append(f"{c}: oracle {wt} vs spark {gt}")
    return bad

def write_diff(out_dir, name, cols, want, got, limit=20):
    """Dump the first `limit` mismatching sorted rows (plus which columns
    differ) to DIFF_<name>.json beside the query dump, so a hash-red row
    in the gate is diagnosable from the artifact alone (round-12 verdict
    item 1c — two rounds of 'red there, green here')."""
    diffs = []
    n = max(len(want), len(got))
    for i in range(n):
        w = want[i] if i < len(want) else None
        g = got[i] if i < len(got) else None
        if w == g:
            continue
        ent = {"sorted_row": i}
        if w is not None and g is not None:
            ent["cols_differ"] = [c for c, (x, y) in zip(cols, zip(w, g)) if x != y]
        ent["want"] = None if w is None else {c: repr(v) for c, v in zip(cols, w)}
        ent["got"] = None if g is None else {c: repr(v) for c, v in zip(cols, g)}
        diffs.append(ent)
        if len(diffs) >= limit:
            break
    path = os.path.join(out_dir, f"DIFF_{name}.json")
    with open(path, "w") as f:
        json.dump({"query": name, "rows_want": len(want), "rows_got": len(got),
                   "first_diffs": diffs}, f, indent=1)
    print(f"     row-diff written: {path}")


def load_profile(sf_dir):
    """Committed per-oracle cost baseline (ORACLE_PROFILE.json at the
    repo root, written by tools/profile_oracle.py --write). Applies only
    when this run's SF matches the profile's — a 0.001-SF compare must
    not be judged against 0.01-SF costs."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "ORACLE_PROFILE.json")
    if not os.path.exists(path):
        return {}
    prof = json.load(open(path))
    if prof.get("sf") != os.path.basename(os.path.normpath(sf_dir)):
        return {}
    return prof.get("oracles", {})


# an oracle >= RATIO x its committed cost (and above FLOOR seconds, so a
# 10 ms oracle jittering to 30 ms stays quiet) is flagged; an oracle with
# NO committed baseline is flagged above NEW_FLOOR seconds — the exact
# r17 failure mode (a new looped oracle landing expensive, unnoticed
# until the driver's whole compare blew its wall-clock budget)
FLAG_RATIO, FLAG_FLOOR, NEW_FLOOR = 2.0, 0.5, 2.0


def main(sf_dir, out_dir):
    import time
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    baseline = load_profile(sf_dir)
    time_flags = []
    n_pass = n_fail = 0
    t_start = time.monotonic()
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        t0 = time.monotonic()
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        t_oracle = time.monotonic() - t0
        base_t = baseline.get(name)
        if base_t is not None:
            if t_oracle >= FLAG_FLOOR and t_oracle >= FLAG_RATIO * base_t:
                time_flags.append(
                    f"{name}: {t_oracle:.2f}s vs committed {base_t:.2f}s "
                    f"({t_oracle / max(base_t, 1e-3):.1f}x)")
        elif baseline and t_oracle >= NEW_FLOOR:
            time_flags.append(
                f"{name}: {t_oracle:.2f}s with NO committed baseline "
                f"(new oracle — profile it before it creeps)")
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={sorted(want_cols)} got={sorted(got_cols)}")
            n_fail += 1
            continue
        type_bad = audit_types(con, name, sql, files)
        if type_bad:
            print(f"FAIL {name}: output TYPE divergence (driver hash is "
                  f"type-sensitive): {'; '.join(type_bad)}")
            n_fail += 1
            continue
        # reorder got columns to oracle's column order by name
        idx = [got_cols.index(c) for c in want_cols]
        got2 = [tuple(r[i] for i in idx) for r in got]
        a = sorted(tuple(norm(c) for c in r) for r in want)
        b = sorted(tuple(norm(c) for c in r) for r in got2)
        if len(a) != len(b):
            print(f"FAIL {name}: rows want={len(a)} got={len(b)}")
            write_diff(out_dir, name, want_cols, a, b)
            n_fail += 1
        elif a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  want {a[bad]}")
            print(f"  got  {b[bad]}")
            write_diff(out_dir, name, want_cols, a, b)
            n_fail += 1
        else:
            # per-query oracle time in the gate log: the t2 compare went
            # over budget once (CORRECTNESS_r17 = {}) because nobody saw
            # the cost distribution — keep it visible
            print(f"PASS {name} ({len(a)} rows, oracle {t_oracle:.2f}s)")
            n_pass += 1
    if time_flags:
        print(f"== ORACLE-TIME FLAGS ({len(time_flags)}) — compare-cost "
              "creep, the r17 empty-artifact precursor:")
        for fl in time_flags:
            print(f"   FLAG {fl}")
        print("   (re-baseline deliberate cost with "
              "tools/profile_oracle.py --write ORACLE_PROFILE.json)")
    print(f"== {n_pass} pass, {n_fail} fail "
          f"({time.monotonic() - t_start:.1f}s total)"
          + (f", {len(time_flags)} time-flagged" if time_flags else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
