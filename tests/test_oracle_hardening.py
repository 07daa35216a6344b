"""Round-15 oracle-hardening tests (VERDICT r14 items 2-3, ADVICE r14).

Each test here pins an ENGINE-vs-ORACLE agreement on a degenerate input
that the standard sf fixtures never produce — the class of latent
divergence the r13/r14 advisors kept finding (NULL-text slices, empty
arrays, repr-vs-binary rounding). The comparison is the driver's own:
run the registry entry on a crafted parquet fixture AND its DuckDB
oracle on the same files, then compare row count + column set +
order-insensitive normalized values.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


@pytest.fixture(scope="module")
def spark():
    from database_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="tests-oracle-hardening",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark


def _write_single_parquet(path: str, table) -> None:
    """One real parquet FILE (not a Spark part-dir) so DuckDB's
    read_parquet and Spark's read both see the same fixture."""
    import pyarrow.parquet as pq

    pq.write_table(table, path)


def _compare_engine_vs_oracle(spark, sf_dir: str, name: str) -> None:
    """The driver-equivalent compare on a crafted fixture dir."""
    import duckdb

    from full_registry_sweep import TABLES, frame_key

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )
    df = E.queries()[name](spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    cur = con.execute(E.oracle_sql()[name])
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols), (s_cols, o_cols)
    assert len(s_rows) == len(o_rows), (len(s_rows), len(o_rows))
    assert frame_key(s_cols, s_rows) == frame_key(o_cols, o_rows)


def test_corpus_slice_jsd_null_text_slice_agrees(spark, tmp_path):
    """A slice whose documents are ALL NULL-text contributes no token
    rows, so a pair-universe built from the token lineage would drop it
    while the documents-derived universe keeps it at the ln 2 disjoint
    convention. Both engines must enumerate the SAME universe and land
    every null-slice pair at exactly round(ln 2, 6)."""
    import pyarrow as pa

    sf = str(tmp_path)
    docs = [
        (1, "a b c a", "s1"),
        (2, "a b d", "s1"),
        (3, "x y z", "s2"),
        (4, None, "s_nulltext"),   # all-NULL-text slice
        (5, None, "s_nulltext"),
        (6, "a x", None),          # NULL source: excluded from pairs
    ]
    _write_single_parquet(
        os.path.join(sf, "documents.parquet"),
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "source": pa.array([d[2] for d in docs], pa.string()),
            }
        ),
    )

    _compare_engine_vs_oracle(spark, sf, "corpus_slice_jsd")

    from database_extractor_spark.registry import QUERIES

    got = {
        (r["s1"], r["s2"]): (r["n_shared"], r["jsd"])
        for r in QUERIES["corpus_slice_jsd"](spark, sf).collect()
    }
    # 3 non-null slices -> 3 pairs; the null-text slice pairs with both
    # others at exactly ln 2 with zero shared terms.
    assert set(got) == {("s1", "s2"), ("s1", "s_nulltext"),
                        ("s2", "s_nulltext")}
    ln2 = round(math.log(2.0), 6)
    assert got[("s1", "s_nulltext")] == (0, ln2)
    assert got[("s2", "s_nulltext")] == (0, ln2)


def test_higher_order_funcs_empty_and_singleton_arrays_agree(
    spark, tmp_path
):
    """An empty embedding errors a bare DuckDB list_reduce and a
    1-element list would skip the init; the seeded fold (list_concat
    ([0.0], ...)) must make both engines agree on empty, singleton, and
    NULL arrays alike."""
    import pyarrow as pa

    sf = str(tmp_path)
    rows = [
        (1, [], 0),             # empty: bare list_reduce would error
        (2, [3.0], 1),          # singleton: bare fold would skip init
        (3, [1.0, -2.0, 2.5], 0),
        (4, None, 1),           # NULL array
    ]
    _write_single_parquet(
        os.path.join(sf, "embeddings.parquet"),
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
    )

    _compare_engine_vs_oracle(spark, sf, "higher_order_funcs")

    from database_extractor_spark.registry import QUERIES

    got = {
        r["vec_id"]: (r["n_pos"], r["exists_gt2"], r["selfdot"], r["pal_dot"])
        for r in QUERIES["higher_order_funcs"](spark, sf).collect()
    }
    assert got[1] == (0, False, 0.0, 0.0)
    assert got[2] == (1, True, 9.0, 9.0)
    assert got[3][0] == 2 and got[3][1] is True


def test_round6_matches_duckdb_on_tie_adversarial_values():
    """ADVICE r14: Decimal(repr(x)) rounds the shortest round-trip
    string, which can cross a 6-dp tie the stored binary value sits
    below (repr(249/2000000) == '0.0001245' -> 0.000125 HALF_UP while
    DuckDB round gives 0.000124). _round6 must equal DuckDB round(x,6)
    — std::round(x*1e6)/1e6 — on every adversarial tie shape: product
    below the tie (124.4999...), product exactly AT the tie from a
    below-tie stored value (123456.5 from 0.1234564999...), small exact
    ties, and a broad random sweep."""
    import random

    import duckdb

    from database_extractor_spark.registry.sharding_ops import _round6

    adversarial = [
        249 / 2000000,   # repr-tie, product below tie -> 0.000124
        0.1234565,       # stored below tie, PRODUCT at tie -> 0.123457
        1.2345675, 0.0000015, 2.5e-6, 3.5e-6, 1.0000005,
        12345.6789115, 0.0, 1e-7, 4.9999995e-7,
    ]
    assert _round6(249 / 2000000) == 0.000124
    assert _round6(0.1234565) == 0.123457
    rng = random.Random(15)
    sweep = [rng.uniform(0, 10) for _ in range(200)] + [
        rng.randint(0, 10**7) / 10**7 for _ in range(200)
    ]
    for x in adversarial + sweep:
        (dd,) = duckdb.sql(f"select round({x!r}::double, 6)").fetchone()
        assert _round6(x) == dd, (x, _round6(x), dd)
