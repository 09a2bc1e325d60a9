#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: read each query's
parquet dump from Verify, run the corresponding oracle SQL in DuckDB
against the same sf dir, and compare (columns sorted by name, rows
sorted by all columns, exact value equality with float tolerance
reporting)."""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(x)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], x[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    aa = a.astype(float)
                    bb = b.astype(float)
                    neq = ~((aa == bb) | (aa.isna() & bb.isna()))
                    if neq.any():
                        md = (aa - bb).abs().max()
                        bad.append(f"{c}: {int(neq.sum())} diffs, maxabs={md}")
                else:
                    aa = a.astype(str)
                    bb = b.astype(str)
                    neq = aa != bb
                    if neq.any():
                        i = neq.idxmax()
                        bad.append(f"{c}: {int(neq.sum())} diffs e.g. {a[i]!r} vs {b[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: ({len(g)} rows) " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
