#!/usr/bin/env python3
"""Per-oracle DuckDB cost profile (round-17 verdict item 1): times each
oracle_sql.json entry's DuckDB execution (fetchall included) so the worst
offenders of the t2 compare's wall-clock are named, not guessed. The
driver's correctness gate runs every oracle from scratch; CORRECTNESS_r17
came back empty most plausibly because the compare blew a wall-clock
budget on the recursive-CTE-heavy oracles — this profile is the measure
step before cutting them.

Usage: python3 tools/profile_oracle.py <sfDir> <verifyOutDir> [topN]
Prints one line per oracle (slowest first) and a total.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, top_n=40):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times = {}
    total = 0.0
    for name in sorted(oracle):
        t0 = time.monotonic()
        try:
            rows = len(con.execute(oracle[name]).fetchall())
            err = ""
        except Exception as e:
            rows, err = -1, str(e)[:120]
        dt = time.monotonic() - t0
        times[name] = dt
        total += dt
        print(f"{dt:8.3f}s {name} ({rows} rows){' ERR ' + err if err else ''}",
              flush=True)
    print(f"\n== total oracle time: {total:.1f}s over {len(times)} queries")
    print(f"== top {top_n} slowest:")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dt:8.3f}s {name}  ({100 * dt / total:4.1f}%)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 40)
