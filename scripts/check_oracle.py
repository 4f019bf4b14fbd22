"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at a given SF and compare
row-count, schema shape, and order-insensitive values against the
DuckDB ``oracle_sql()``.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

# a budget-killed sweep must not lose its tail to block buffering, and
# per-query lines should land as soon as the query finishes (the r4
# driver artifact lost exactly the trailing entries of a long sweep)
import functools
print = functools.partial(print, flush=True)  # noqa: A001

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataflows_spark import build_session  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    # STRICT, type-tagged: the driver's value hash caught last-ulp double
    # diffs (join_agg) and DuckDB HUGEINT (decimal128) vs Spark int64
    # (json_extract) that a lossy %.9g str canonicalization masked.
    import decimal

    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if hasattr(v, "isoformat"):
        try:
            return v.replace(tzinfo=None).isoformat()
        except TypeError:
            return v.isoformat()
    return str(v)


def canon(rows, cols):
    return sorted(tuple(norm_cell(r[c] if isinstance(r, dict) else r[i]) for i, c in enumerate(cols)) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = build_session(app_name="oracle_check")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        return 1
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            # fetch via Arrow: preserves nullable int64 (unlike pandas) and
            # surfaces HUGEINT sums as Decimal — a sum over BIGINT must be
            # CAST to BIGINT in the oracle or the type tag mismatches
            otab = con.execute(oracles[name]).arrow()
            ocols = otab.column_names
            orows = [tuple(d[c] for c in ocols) for d in otab.to_pylist()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols {scols} vs {ocols}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(srows)} vs {len(orows)}")
        if ok:
            order = [ocols.index(c) for c in sorted(scols)]
            s_canon = canon([dict(zip(scols, r)) for r in srows], sorted(scols))
            o_canon = sorted(
                tuple(norm_cell(r[i]) for i in order) for r in orows
            )
            if s_canon != o_canon:
                ok = False
                diff = [(a, b) for a, b in zip(s_canon, o_canon) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status}  {name}: {len(srows)} rows [{time.time()-t0:.1f}s] {'; '.join(msgs)}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
