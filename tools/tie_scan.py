#!/usr/bin/env python3
"""Scan gated queries for cross-engine round()-representation hazards.

The driver's gate hashes values, so a gated DOUBLE produced by
round(x, n) diverges between engines when the PRE-round double sits on
an exact n-dp half-way tie (different DuckDB builds break ties in
different directions vs Spark's BigDecimal HALF_UP) or when x is a tiny
negative that rounds to zero (DuckDB keeps the sign: -0.0; Spark's
BigDecimal path has no signed zero). Both killed gates that were green
locally (q_embed_cov, q_pack_bins, round 7) — the hazard is invisible
in post-round output and invisible to a local compare when the local
DuckDB build happens to agree, so it must be detected on the PRE-round
values.

This tool rewrites each oracle SQL by stripping every scaled
round(expr, n) wrapper to (expr), re-runs it in DuckDB, and scans every
float column of the result for:
  - exact binary half-ties at the stripped scales (Fraction(x)*10^n has
    denominator 2 — the q_pack_bins class: dyadic ratios);
  - shortest-repr ties (Spark rounds BigDecimal.valueOf(x), i.e. the
    shortest decimal repr, so a tie in repr(x) is also divergent);
  - sign-splitting zeros: x < 0 with |x| small enough that round(x, n)
    is zero (the q_embed_cov class: DuckDB -0.0 vs Spark +0.0).

NOTE: stripping also removes round() on intermediate (non-gated)
columns, so a hit is a lead to adjudicate, not automatically a bug —
but a clean run is a real certificate that no gated value class can
tie or sign-split at the scanned scale factor.

Usage: python3 tools/tie_scan.py <sf_dir> <verify_out_dir> [query,...]
Exit 1 if any hazard found.
"""
import json
import sys
from decimal import Decimal
from fractions import Fraction

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def strip_rounds(sql: str):
    """Remove every round(expr, n) with n >= 1.

    Returns (sql, scales, alias_scale) where alias_scale maps an output
    alias to its round scale when the pattern `round(expr, n) AS alias`
    is directly visible — used to scan each column only at ITS scale
    (a scale-4 column is not hazarded by a scale-6 tie)."""
    scales = set()
    alias_scale = {}
    out = sql
    while True:
        low = out.lower()
        i = 0
        found = False
        while True:
            i = low.find("round(", i)
            if i < 0:
                break
            # paren-match the argument list
            depth, j = 0, i + 5
            while j < len(out):
                if out[j] == "(":
                    depth += 1
                elif out[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            inner = out[i + 6:j]
            # split on the top-level comma to find the scale arg
            d = 0
            comma = -1
            for p, ch in enumerate(inner):
                if ch == "(":
                    d += 1
                elif ch == ")":
                    d -= 1
                elif ch == "," and d == 0:
                    comma = p
            if comma >= 0:
                scale = inner[comma + 1:].strip()
                if scale.isdigit() and int(scale) >= 1:
                    scales.add(int(scale))
                    import re
                    m = re.match(r"\s*as\s+(\w+)", low[j + 1:])
                    if m:
                        alias_scale[m.group(1)] = int(scale)
                    out = out[:i] + "(" + inner[:comma] + ")" + out[j + 1:]
                    found = True
                    break
            i = j
        if not found:
            return out, scales, alias_scale


def scan_values(vals: np.ndarray, scales):
    """Return hazard strings for a float64 array at the given scales."""
    vals = vals[~np.isnan(vals) & ~np.isinf(vals)]
    hits = []
    for n in sorted(scales):
        p = 10 ** n
        scaled = vals * p
        # sign-splitting zeros: negative but rounds to zero at scale n
        nz = vals[(vals < 0) & (np.abs(scaled) <= 0.5)]
        if nz.size:
            hits.append(f"scale{n}:neg_zero x{nz.size} e.g. {nz[0]!r}")
        # half-tie prefilter, then exact adjudication
        frac = np.abs(scaled - np.floor(scaled) - 0.5)
        ties = []
        for x in vals[frac < 1e-6]:
            if (Fraction(float(x)) * p).denominator == 2:
                ties.append(float(x))
            else:
                d = Decimal(repr(float(x))) * p
                if abs(d - d.to_integral_value()) == Decimal("0.5"):
                    ties.append(float(x))
        if ties:
            hits.append(f"scale{n}:half_tie x{len(ties)} e.g. {ties[:3]}")
    return hits


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = n_scanned = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        stripped, scales, alias_scale = strip_rounds(sql)
        if not scales:
            continue
        n_scanned += 1
        try:
            df = con.execute(stripped).df()
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print(f"ERROR {name}: stripped SQL failed: "
                  f"{str(ex)[:200]}")
            continue
        for c in df.columns:
            if df[c].dtype not in (np.float64, np.float32):
                continue
            col_scales = {alias_scale[c.lower()]} \
                if c.lower() in alias_scale else scales
            hits = scan_values(df[c].to_numpy(dtype=np.float64), col_scales)
            if hits:
                bad += 1
                print(f"HAZARD {name}.{c}: {'; '.join(hits)}")
    print(f"== scanned {n_scanned} round()-gated queries, "
          f"{bad} hazardous columns ==")
    return 1 if bad else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
