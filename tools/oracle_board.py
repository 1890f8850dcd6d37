#!/usr/bin/env python3
"""Subset correctness board in the driver's CORRECTNESS_r{N}.json shape.

The driver pins the oracle gate at sf0.01; this tool re-runs the SAME
three-gate compare (rows / schema / hash-equivalent normalized row set)
for a NAMED SUBSET of queries at any scale factor — the r17 use: the 20
heaviest queries at sf0.1, where overflow, threshold drift and
histogram-edge bugs would hide from a toy-scale oracle.

Usage: python3 tools/oracle_board.py <sfDir> <verifyOutDir> <out.json> q1,q2,...
(dev-only tool; the shipped library has no Python dependency)
"""
import json
import sys

import duckdb


def norm_val(v):
    if hasattr(v, "timestamp"):
        return int(v.timestamp() * 1000)
    if isinstance(v, float):
        return round(v, 9)
    return v


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(norm_val(r[i]) for i in order) for r in rows),
                  key=repr)


def main():
    sf_dir, out_dir, dest, names = (
        sys.argv[1], sys.argv[2], sys.argv[3],
        sys.argv[4].split(","))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    board = {}
    for name in names:
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            import time
            t0 = time.time()
            want = con.execute(oracle[name])
            want_cols = [d[0] for d in want.description]
            want_rows = norm(want.fetchall(), want_cols)
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = norm(got.fetchall(), got_cols)
            row["spark_rows"] = len(got_rows)
            row["oracle_rows"] = len(want_rows)
            row["rows_match"] = len(got_rows) == len(want_rows)
            row["schema_match"] = sorted(want_cols) == sorted(got_cols)
            row["hash_match"] = want_rows == got_rows
            row["oracle_sec"] = round(time.time() - t0, 2)
        except Exception as e:
            row["err"] = str(e)[:200]
        board[name] = row
        status = "ok  " if (row["rows_match"] and row["schema_match"]
                            and row["hash_match"]) else "FAIL"
        print(f"{status} {name} ({row['spark_rows']} rows, "
              f"{row.get('oracle_sec', '?')} s oracle)", flush=True)
    json.dump(board, open(dest, "w"), indent=2)
    bad = [n for n, r in board.items()
           if not (r["rows_match"] and r["schema_match"] and r["hash_match"])]
    print(f"\n{len(board) - len(bad)} ok, {len(bad)} fail -> {dest}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
