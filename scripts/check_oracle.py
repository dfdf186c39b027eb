"""Mirror of the driver's CORRECTNESS gate at an arbitrary sf dir.

Usage: python scripts/check_oracle.py [sf_dir]
Runs every queries() entry against its oracle_sql() twin in DuckDB and
reports per-query row-count / schema / value-hash match.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from ai_data_matching_spark.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6f}"
    return str(val)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = build_session(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_ok = n_bad = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) "
                  f"[{time.perf_counter() - t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {exc}")
            n_bad += 1
            continue
        issues = []
        if sorted(scols) != sorted(dcols):
            issues.append(f"schema {scols} vs {dcols}")
        if len(srows) != len(drows):
            issues.append(f"rows {len(srows)} vs {len(drows)}")
        if not issues:
            sc, dc = _canon_rows(scols, srows), _canon_rows(dcols, drows)
            if sc != dc:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                issues.append(f"values differ, e.g. {diff}")
        if issues:
            print(f"FAIL {name}: {'; '.join(issues)}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(srows)} rows "
                  f"[{time.perf_counter() - t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
