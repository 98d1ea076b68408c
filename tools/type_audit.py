#!/usr/bin/env python3
"""Audit oracle output TYPES against the Spark result schema, per gate.

The round-7/8 q_pack_bins red was invisible to value-level checks: every
value matched, but the oracle's `bin` was an uncast DuckDB HUGEINT (a
window sum(BIGINT) fed an integer division) which pandas lands as
float64, while Spark wrote int64 — an int-vs-float TYPE-FAMILY split
that a type-sensitive driver hash fails on identical values. tie_scan.py
is the value-level scanner; this is its type-level complement.

For every gate: DESCRIBE the oracle SQL (plans only — nothing executes)
and DESCRIBE the Spark result parquet, map both to the family pandas
would land them in (HUGEINT/DECIMAL -> floating!), and flag any column
whose families differ. Also WARN on non-native oracle types (HUGEINT,
DECIMAL) even when the families happen to agree — DECIMAL-vs-DOUBLE
survives pandas conversion today but is the same hazard class one
driver change away.

Usage: python3 tools/type_audit.py <sf_dir> <verify_out_dir> [query,...]
Exit 1 if any family mismatch.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

INTEGER = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
           "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
# HUGEINT and DECIMAL land in pandas as float64 — classify by where the
# value ARRIVES at the driver, not by what DuckDB calls it
FLOATING = {"FLOAT", "DOUBLE", "REAL", "HUGEINT", "UHUGEINT"}
NON_NATIVE = {"HUGEINT", "UHUGEINT"}


def family(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "floating"
    if t in INTEGER:
        return "integer"
    if t in FLOATING:
        return "floating"
    if t == "BOOLEAN":
        return "boolean"
    if t.startswith("TIMESTAMP") or t in ("DATE", "TIME"):
        return "datetime"
    if t in ("VARCHAR", "BLOB", "UUID"):
        return "string"
    if (t.endswith("[]") or t.startswith("STRUCT")
            or t.startswith("MAP") or t.startswith("LIST")):
        return "nested"
    return "other:" + t


def is_non_native(t: str) -> bool:
    t = t.upper()
    return t in NON_NATIVE or t.startswith("DECIMAL")


def describe(con, sql: str) -> dict:
    rows = con.execute("DESCRIBE " + sql).fetchall()
    return {r[0]: r[1] for r in rows}


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    mismatches = []
    warns = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            # subset Verify run — absent outputs are compare.py's concern
            continue
        try:
            ora = describe(con, sql)
            spk = describe(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as ex:  # noqa: BLE001
            mismatches.append(
                (name, "<describe>", str(ex).replace("\n", " | ")[:200]))
            continue
        ok = True
        for col, ot in ora.items():
            st = spk.get(col)
            if st is None:
                # column-set diffs are compare.py's job; skip here
                continue
            if family(ot) != family(st):
                ok = False
                mismatches.append(
                    (name, col, f"oracle {ot} ({family(ot)}) vs "
                                f"spark {st} ({family(st)})"))
            elif is_non_native(ot):
                warns.append((name, col, ot))
        if ok:
            n_ok += 1
    for name, col, msg in mismatches:
        print(f"MISMATCH {name}.{col}: {msg}")
    for name, col, t in warns:
        print(f"WARN {name}.{col}: non-native oracle type {t} "
              f"(survives pandas today; cast it)")
    print(f"== audited {n_ok + len(set(m[0] for m in mismatches))} gates: "
          f"{len(mismatches)} type-family mismatches, "
          f"{len(warns)} non-native warnings ==")
    return 1 if mismatches else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
