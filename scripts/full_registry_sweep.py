#!/usr/bin/env python
"""Driver-equivalent correctness sweep over EVERY registry entry.

The per-round driver verifies only the first 50 entries of queries();
this script replays the same compare (row count + column set +
order-insensitive value compare against the DuckDB oracle, sf0.01) over
ALL entries, so the cohort the 50-slot window defers to later rounds
still carries fresh local proof each round (the round-7/round-8
belt-and-braces pattern recorded in BASELINE.md).

Usage: python scripts/full_registry_sweep.py [--sf-dir DIR] [--only RX]
Prints one line per entry and a final JSON summary.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9) + 0.0)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        # a DATE equals the midnight TIMESTAMP on the other engine (the
        # driver's comparator coerces both to datetime64; day-grain
        # oracles legitimately return DATE where Spark date_trunc
        # returns midnight timestamps)
        return datetime.datetime(v.year, v.month, v.day).isoformat(
            timespec="microseconds"
        )
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def non_driver_comparable_cols(schema) -> list:
    """Column names whose type the per-round driver cannot canonicalize.

    The driver's comparator loads both result sets into pandas and
    sort_values/factorizes every column — ARRAY/MAP/STRUCT cells arrive
    as Python lists/dicts, which are unhashable and crash the compare
    (CORRECTNESS_r15: inverted_index_postings, ``TypeError: unhashable
    type: 'list'``). Any entry emitting a complex column can therefore
    never earn a green driver row; encode as a delimited string or
    explode instead. Enforced per-entry by both sweep scripts and by
    tests/test_plan_lint.py::test_output_schema_is_driver_comparable —
    the class-level guard VERDICT r15 item 1 asked for."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated entry names")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from database_extractor_spark.session import create_spark_client

    spark = create_spark_client()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    queries = E.queries()
    oracles = E.oracle_sql()
    names = list(queries)
    if args.only:
        names = [n for n in args.only.split(",") if n in queries]

    summary = {"match": 0, "mismatch": [], "error": [], "no_oracle": []}
    for name in names:
        try:
            df = queries[name](spark, args.sf_dir)
            bad = non_driver_comparable_cols(df.schema)
            if bad:
                summary["mismatch"].append(name)
                print(f"{name}: NON-DRIVER-COMPARABLE COLUMNS {bad}")
                continue
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                summary["no_oracle"].append(name)
                print(f"{name}: rows={len(s_rows)} NO_ORACLE")
                continue
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            if sorted(s_cols) != sorted(o_cols):
                summary["mismatch"].append(name)
                print(f"{name}: SCHEMA MISMATCH {s_cols} vs {o_cols}")
                continue
            if len(s_rows) != len(o_rows):
                summary["mismatch"].append(name)
                print(f"{name}: ROWS {len(s_rows)} vs {len(o_rows)}")
                continue
            if frame_key(s_cols, s_rows) != frame_key(o_cols, o_rows):
                summary["mismatch"].append(name)
                print(f"{name}: VALUE MISMATCH ({len(s_rows)} rows)")
                continue
            summary["match"] += 1
            print(f"{name}: ok ({len(s_rows)} rows)")
        except Exception:
            summary["error"].append(name)
            print(f"{name}: ERROR\n{traceback.format_exc(limit=3)}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
