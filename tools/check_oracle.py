#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: read each query's
parquet dump from Verify, run the corresponding oracle SQL in DuckDB
against the same sf dir, and compare (columns sorted by name, rows
sorted by all columns, exact value equality with float tolerance
reporting)."""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _fmt(v) -> str:
    """Canonical cell text matching Verify.fmt: doubles as hex-float
    (bit-exact, JDK/libc-independent), None as NULL. Special values
    spelled the way Java's Double.toHexString spells them."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        # normalize python's '0x1.0000000000000p+0' to Java
        # Double.toHexString's '0x1.0p0' (trailing-zero-trimmed
        # mantissa, unsigned positive exponent) so spark-side and
        # oracle-side snapshot rows diff textually
        h = float.hex(v)
        mant, exp = h.split("p")
        if "." in mant:
            head, frac = mant.split(".")
            frac = frac.rstrip("0") or "0"
            mant = head + "." + frac
        else:
            mant = mant + ".0"
        exp = exp.lstrip("+")
        return mant + "p" + exp
    return str(v)


def dump_oracle_rows(sf_dir: str, name: str, df: pd.DataFrame) -> None:
    """On FAIL, persist the DuckDB-side rows in the same canonical
    format as Verify's spark-side snapshots, so a gate disagreement
    leaves BOTH engines' rows in the repo and the diff is one `diff`
    command (the q64 forensics pattern, mirrored oracle-side)."""
    snap_dir = os.path.join("bench", "verify_snapshots",
                            os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(snap_dir, exist_ok=True)
    c = canon(df)
    lines = sorted("\t".join(_fmt(v) for v in row)
                   for row in c.itertuples(index=False, name=None))
    with open(os.path.join(snap_dir, f"{name}.oracle.tsv"), "w") as f:
        f.write(f"# duckdb={duckdb.__version__}\n")
        f.write("\t".join(c.columns) + "\n")
        f.write("\n".join(lines) + "\n")


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # Pin the ORACLE side's environment next to the engine-side
    # snapshot header (Verify records sfDir/cpus/java): the q64
    # incident cost rounds because an environment-sensitive hash diff
    # had nothing recording which DuckDB produced the oracle values.
    print(f"oracle env: duckdb={duckdb.__version__} "
          f"python={sys.version.split()[0]} pandas={pd.__version__}")
    try:
        sf = os.path.basename(os.path.normpath(sf_dir))
        snap = os.path.join("bench", "verify_snapshots", sf)
        if os.path.isdir(snap):
            with open(os.path.join(snap, "ORACLE_ENV.txt"), "w") as f:
                f.write(f"duckdb={duckdb.__version__}\n"
                        f"python={sys.version.split()[0]}\n"
                        f"pandas={pd.__version__}\n")
    except OSError:
        pass  # read-only checkout: the stdout line above still records it
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
            try:
                dump_oracle_rows(sf_dir, name, exp)
            except Exception as e:
                print(f"  (oracle-row dump failed: {e})")
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
            try:
                dump_oracle_rows(sf_dir, name, exp)
            except Exception as e:
                print(f"  (oracle-row dump failed: {e})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
