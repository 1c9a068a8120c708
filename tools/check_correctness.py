"""Local twin of the driver's t2 correctness gate.

Runs every workload on Spark and its oracle on DuckDB over the same
parquet, then compares row count, column names, and order-insensitive
values (exact equality after canonicalization). Run:

    python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def canon(v):
    """Canonicalize a cell for cross-engine comparison.

    STRICT: Decimals are compared by exact string (scale included, no
    ``normalize()``) — the driver's hash is sensitive to trailing zeros,
    so the local gate must be at least as strict. Workloads should not
    emit Decimal outputs at all (cast to DOUBLE on both sides)."""
    import datetime
    import math

    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    import duckdb

    from ariadne_dbt_spark.session import TABLE_NAMES, get_spark, table_path
    from ariadne_dbt_spark.workloads import load_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    registry = load_all()
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            dec_cols = [f.name for f in sdf.schema.fields if "decimal" in f.dataType.simpleString()]
            if dec_cols:
                print(f"WARN {name}: DecimalType output columns {dec_cols} — not hash-safe")
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"row count {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sm = rows_to_multiset([tuple(r) for r in srows], scols)
            om = rows_to_multiset(orows, ocols)
            if sm != om:
                diff_s = {k: v for k, v in sm.items() if om.get(k) != v}
                diff_o = {k: v for k, v in om.items() if sm.get(k) != v}
                ex_s = list(diff_s.items())[:2]
                ex_o = list(diff_o.items())[:2]
                problems.append(f"values differ: spark-only {ex_s} | oracle-only {ex_o}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
