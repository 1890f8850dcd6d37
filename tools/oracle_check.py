#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Replicates the driver's t2 gate shape: run Verify (Spark) into an outDir,
then execute each oracle SQL in DuckDB over the same sf parquet tables and
compare row sets exactly (columns sorted by name, rows sorted).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(dev-only tool; the shipped library has no Python dependency)
"""
import json
import sys

import duckdb


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_val(r[i]) for i in order))
    out.sort(key=repr)
    return out


def norm_val(v):
    if hasattr(v, "timestamp"):  # datetime
        return int(v.timestamp() * 1000)
    if isinstance(v, float):
        return round(v, 9)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = norm(want.fetchall(), want_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = norm(got.fetchall(), got_cols)
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={sorted(want_cols)} got={sorted(got_cols)}")
            n_fail += 1
        elif want_rows != got_rows:
            print(f"FAIL {name}: {len(want_rows)} oracle rows vs {len(got_rows)} spark rows")
            for i, (w, g) in enumerate(zip(want_rows, got_rows)):
                if w != g:
                    print(f"  first diff at {i}: want={w} got={g}")
                    break
            if len(want_rows) != len(got_rows):
                only_w = [r for r in want_rows if r not in got_rows][:3]
                only_g = [r for r in got_rows if r not in want_rows][:3]
                print(f"  only-oracle: {only_w}\n  only-spark: {only_g}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got_rows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
