#!/usr/bin/env python3
"""Per-oracle DuckDB cost profile (round-17 verdict item 1): times each
oracle_sql.json entry's DuckDB execution (fetchall included) so the worst
offenders of the t2 compare's wall-clock are named, not guessed. The
driver's correctness gate runs every oracle from scratch; CORRECTNESS_r17
came back empty most plausibly because the compare blew a wall-clock
budget on the recursive-CTE-heavy oracles — this profile is the measure
step before cutting them.

Usage: python3 tools/profile_oracle.py <sfDir> <verifyOutDir> [topN] [--write <path>]
Prints one line per oracle (slowest first) and a total. With --write,
persists the profile as JSON — commit it as ORACLE_PROFILE.json at the
repo root and tools/compare_oracle.py gates every future compare run at
the same SF against it (any oracle >= 2x its committed cost is flagged,
the permanent guard against the r17 compare-wall-clock failure mode).
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, top_n=40, write_path=None):
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
    if write_path:
        with open(write_path, "w") as f:
            json.dump({"sf": os.path.basename(os.path.normpath(sf_dir)),
                       "total_sec": round(total, 3),
                       "n_oracles": len(times),
                       "oracles": {k: round(v, 3) for k, v in sorted(times.items())}},
                      f, indent=1)
        print(f"== profile written: {write_path}")


if __name__ == "__main__":
    args = sys.argv[1:]
    wp = None
    if "--write" in args:
        i = args.index("--write")
        wp = args[i + 1]
        args = args[:i] + args[i + 2:]
    main(args[0], args[1], int(args[2]) if len(args) > 2 else 40, wp)
