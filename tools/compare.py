#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Loads each Spark result parquet from the Verify output dir, runs the
matching oracle SQL in DuckDB against the scale-factor parquet tables,
and compares (schema column set, row count, and values after sorting
columns by name and rows by all columns). Reports per-query PASS/FAIL
with a diff sample on mismatch.

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                raise AssertionError(
                    f"columns differ: spark={list(g.columns)} oracle={list(e.columns)}")
            if len(g) != len(e):
                raise AssertionError(f"row counts differ: spark={len(g)} oracle={len(e)}")
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            msg = str(ex).replace("\n", " | ")[:600]
            print(f"FAIL {name}: {msg}")
            try:
                bad = g.compare(e)
                print(bad.head(5))
            except Exception:
                pass
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
