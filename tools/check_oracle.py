#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
fixture tables, and compares: column names, row count, and value-sorted
content. Exits non-zero on any mismatch.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # replicate the DRIVER's canonicalizer, which sorts RAW values before
    # stringifying: a map/array/struct column throws here exactly as it
    # does driver-side (round 9's q_wide_row shipped red because this
    # local stand-in stringified first and hid the failure)
    df.sort_values(by=list(df.columns))
    # normalize every value to a comparable string
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.map(lambda v: "null" if pd.isna(v) else f"{v:.9g}")
        elif pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.astype("datetime64[us]").astype(str)
        else:
            out[c] = col.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # scaled fixtures (tools.ScaleUp) write Spark-style DIRECTORIES
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        if name.startswith("zz_probe_"):
            # oracle-side diagnostic (no Spark twin): run it and print the
            # result — e.g. the DuckDB version + cast-rule canary
            print(f"PROBE {name}: {con.sql(sql).df().to_dict('records')}")
            continue
        try:
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                failures += 1
            elif len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                failures += 1
            elif not g.equals(w):
                neq = (g != w).any(axis=1)
                print(f"FAIL {name}: {neq.sum()} differing rows; first:")
                print("  spark:", g[neq].head(2).to_dict("records"))
                print("  duck :", w[neq].head(2).to_dict("records"))
                failures += 1
            else:
                print(f"OK   {name}: {len(g)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
