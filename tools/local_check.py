#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads Verify's parquet outputs from OUTDIR, runs each oracle SQL from
oracle_sql.json in DuckDB against the sf parquet tables, and compares:
schema (column names), row count, and values (sorted by all columns,
exact equality; float columns must be bit-identical by design).

Usage: python3 tools/local_check.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    return con, oracles


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con, oracles = load(sf_dir, out_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            if not g.equals(w):
                neq = (g != w) & ~(g.isna() & w.isna())
                bad_cols = [c for c in g.columns if neq[c].any()]
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:2]:
                    idx = neq[c].idxmax()
                    print(f"  {c}[{idx}]: got={g[c][idx]!r} want={w[c][idx]!r}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
