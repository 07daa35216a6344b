"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB ``oracle_sql()`` twin
side by side and compare row count + column names + order-insensitive
values — so CORRECTNESS_r{N}.json failures are caught here first.

Values are compared EXACTLY (no tolerance): the engine is designed so
that doubles are bit-identical across engines (decimal-exact sums,
identical per-row IEEE expression sequences) — see registry.py docstring.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR

import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


def _cell(v):
    import datetime

    if v is None:
        return "␀"
    if isinstance(v, float) and math.isnan(v):
        return "␀"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        # mirror the driver comparator: a DATE equals the midnight
        # TIMESTAMP on the other engine (Spark to_date vs a pandas-read
        # DuckDB date arriving as datetime64) — same rule as
        # scripts/full_registry_sweep.py::norm_cell
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "ts" in df.columns


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(name, spark, con):
    got = E.queries()[name](spark, SF_DIR).toPandas()
    sql = E.oracle_sql().get(name)
    if sql is None:
        # rows-only entries (engine-specific hashes); semantics pinned in
        # test_llm_ops.py against exact baselines
        assert got is not None
        return
    want = con.sql(sql).df()
    got_cols, got_rows = _canon(got)
    want_cols, want_rows = _canon(want)
    assert got_cols == want_cols, f"{name}: column mismatch {got_cols} vs {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: row count {len(got_rows)} vs {len(want_rows)}"
    )
    mismatches = [
        (g, w) for g, w in zip(got_rows, want_rows) if g != w
    ]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"


def test_every_query_has_doc():
    qs = E.queries()
    for name, fn in qs.items():
        assert fn.__doc__ or name.startswith(("join", "agg", "set", "topk", "window",
                                              "distinct", "string", "math", "json",
                                              "array", "unpivot", "o0", "text")), name
