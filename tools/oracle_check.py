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


# DuckDB types that the driver's typed hash gate can never see from a Spark
# parquet file: an oracle output column typed one of these is always a bug
# (the round-12 escape: SUM(BIGINT) silently types as HUGEINT).
FORBIDDEN_TYPES = ("HUGEINT", "UHUGEINT")


def type_class(t):
    """Canonical comparison class for a DuckDB column_type string."""
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return t  # integer widths hash differently under the typed gate
    if t in ("FLOAT", "REAL"):
        return "FLOAT"
    return t


def type_gate(con, name, sql, out_dir):
    """DESCRIBE the oracle SQL vs the Spark parquet and flag type drift.

    Returns a list of human-readable problems (empty = clean). The driver's
    hash gate is typed, so value-identical outputs with different types
    (HUGEINT from an uncast SUM, DECIMAL from AVG, INT vs BIGINT) mismatch.
    """
    want = {r[0]: r[1] for r in
            con.execute(f"DESCRIBE ({sql})").fetchall()}
    got = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE (SELECT * FROM '{out_dir}/{name}/*.parquet')").fetchall()}
    problems = []
    for col, wt in sorted(want.items()):
        wtu = wt.upper()
        if any(wtu.startswith(f) for f in FORBIDDEN_TYPES):
            problems.append(
                f"oracle column {col} types as {wt} — cast it (Spark side "
                f"is {got.get(col, '<missing>')})")
        elif col in got and type_class(wt) != type_class(got[col]):
            problems.append(
                f"type drift on {col}: oracle {wt} vs spark {got[col]}")
    return problems


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
        try:
            type_problems = type_gate(con, name, sql, out_dir)
        except Exception as e:
            type_problems = [f"type gate error: {e}"]
        if type_problems:
            print(f"FAIL {name}: " + "; ".join(type_problems))
            n_fail += 1
        elif sorted(want_cols) != sorted(got_cols):
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
