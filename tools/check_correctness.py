"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark at sf0.01 and its oracle_sql() in
DuckDB over the same parquet, then compares row count, column names,
and an order-insensitive value multiset. Exit 1 on any mismatch.

Usage: python tools/check_correctness.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def canon(v):
    """Canonicalize a cell for cross-engine comparison (mirrors a
    reasonable driver: exact for ints/strings/bools, repr for floats,
    ISO for timestamps, recursive for lists)."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = "|".join(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from aws_glue_data_catalog_replication_utility_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or sorted(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        probs = []
        # The driver's canonicalizer cannot hash container cells (pandas
        # sort_values raises on list values) — fail loudly here so an
        # array-typed output column never looks green locally. Checked
        # on the SCHEMA (ADVICE r03: a cell sample misses columns whose
        # sampled values are all NULL), with the cell scan kept as a
        # belt-and-braces net for e.g. object-typed columns.
        from pyspark.sql import types as _T

        bad = sorted(
            {
                f.name
                for f in sdf.schema.fields
                if isinstance(
                    f.dataType, (_T.ArrayType, _T.MapType, _T.StructType)
                )
            }
            | {
                c
                for i, c in enumerate(s_cols)
                if any(
                    isinstance(r[i], (list, tuple, dict, set))
                    for r in s_rows[:200]
                )
            }
        )
        if bad:
            probs.append(
                f"container-typed columns (driver canonicalizer rejects): {bad}"
            )
        if sorted(s_cols) != sorted(d_cols):
            probs.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            probs.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not probs:
            ms, md = multiset(s_rows, s_cols), multiset(d_rows, d_cols)
            if ms != md:
                only_s = [k for k in ms if ms[k] != md.get(k, 0)][:3]
                only_d = [k for k in md if md[k] != ms.get(k, 0)][:3]
                probs.append(f"values differ; spark-only={only_s} duck-only={only_d}")
        dt = time.time() - t0
        if probs:
            print(f"FAIL  {name} ({dt:.1f}s): " + " | ".join(probs))
            failures.append(name)
        else:
            print(f"OK    {name} ({dt:.1f}s, {len(s_rows)} rows)")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print(f"\nall {len(names)} queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
