"""Fixture-drift tripwires (VERDICT r7 item 8): every cross-engine
assumption the DuckDB oracles lean on, asserted in ONE module so a
regenerated /root/testdata that breaks an invariant fails loudly HERE —
with the reason — instead of as an opaque hash mismatch in some entry.

Each test names the entries that depend on the invariant. Checks run on
both the test fixture (sf0.001) and the driver's correctness fixture
(sf0.01) via DuckDB/pyarrow directly — no Spark session needed, so the
whole audit is sub-second.
"""

import os

import duckdb
import pyarrow.parquet as pq
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


class _Fixture:
    def __init__(self, sf_dir):
        self.sf_dir = sf_dir
        self.con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            self.con.execute(
                f"create view {t} as select * from "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )

    def execute(self, sql):
        return self.con.execute(sql)


@pytest.fixture(scope="module", params=SFS, ids=["sf0.001", "sf0.01"])
def con(request):
    fx = _Fixture(request.param)
    yield fx
    fx.con.close()


def one(con, sql):
    return con.execute(sql).fetchone()[0]


# ---------------------------------------------------------------------------
# events
# ---------------------------------------------------------------------------


def test_events_value_never_null(con):
    """ffill_resample / histogram_fixed_bins / every windowed agg oracle:
    the no-null premise lets take-last, bin interpolation, and window
    frames skip null handling on both engines (registry.py:1996)."""
    assert one(con, "select count(*) from events where value is null") == 0


def test_events_value_quantization_headroom(con):
    """ts_outlier_zscore sums (value*1e3)^2 over 50-row windows in int64
    (Spark) while DuckDB promotes to HUGEINT — silent wrap on one side
    only. Worst-case window sum must keep 100x headroom under int64 max
    (the r6 ADVICE pin, generalized to every quantizing entry: 1e3 for
    zscore, 1e4 TPC-H cents, 1e6 psi/stat entries on per-row values)."""
    max_qv = one(con, "select max(abs(floor(value * 1000.0))) from events")
    assert 50 * max_qv * max_qv < (1 << 63) // 100
    # single-value 1e6 quantization (psi_drift, stat entries) stays int64
    assert one(con, "select max(abs(value)) * 1e6 from events") < (1 << 62)


def test_events_ts_is_micros_ntz(con):
    """The batch/stream readers and every time oracle assume parquet
    TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads NTZ (cast to
    session-UTC timestamp), DuckDB reads naive micros — values align
    ONLY under this physical type (round-5 re-encode)."""
    schema = pq.read_schema(os.path.join(con.sf_dir, "events.parquet"))
    t = schema.field("ts").type
    assert str(t) == "timestamp[us]", f"events.ts drifted to {t}"


def test_events_group_keys_never_null(con):
    """Windowed/session/streaming oracles group by (user_id, event_type)
    without null-key handling on either engine."""
    assert (
        one(
            con,
            "select count(*) from events "
            "where user_id is null or event_type is null or ts is null",
        )
        == 0
    )


# ---------------------------------------------------------------------------
# documents
# ---------------------------------------------------------------------------


def test_documents_text_nonempty_and_lang_nonnull(con):
    """udtf_tokenize_offsets drops empty docs via LATERAL inner semantics
    while its oracle filters len(trim(text)) > 0 — equivalent ONLY when
    no doc is empty-after-trim. quality_classifier_score divides by
    n_tokens >= 1; dsir/cap_per_group group on lang."""
    assert one(con, "select count(*) from documents where text is null") == 0
    assert one(con, "select count(*) from documents where len(trim(text)) = 0") == 0
    assert one(con, "select count(*) from documents where lang is null") == 0


def test_documents_doc_id_unique(con):
    """Pair-emitting dedups key every join on doc_id; duplicates would
    fan out pairs differently than the oracles' DISTINCT-free replays."""
    assert one(con, "select count(*) - count(distinct doc_id) from documents") == 0


def test_documents_tokens_single_space_separable(con):
    """Gram/shingle oracles rebuild n-grams with array_to_string(..., ' ')
    vs Spark concat_ws(' ', ...). Tokens containing a space are
    impossible (split on \\s+), but a token of length 0 (double space)
    would desync gram positions between engines if split semantics ever
    diverged — pin that no document produces empty tokens."""
    n = one(
        con,
        r"""select count(*) from (
            select unnest(string_split_regex(lower(trim(text)), '\s+')) as t
            from documents) where len(t) = 0""",
    )
    assert n == 0


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


def test_embeddings_dim64_nonnull_finite(con):
    """Every similarity entry slices/folds exactly 64 dims; zip_with
    truncation on a short vector silently mis-scores in Spark only.
    NaN/Inf would break cosine ordering differently per engine."""
    assert one(con, "select count(*) from embeddings where embedding is null") == 0
    assert one(con, "select count(distinct len(embedding)) from embeddings") == 1
    assert one(con, "select max(len(embedding)) from embeddings") == 64
    bad = one(
        con,
        "select count(*) from embeddings where "
        "len(list_filter(embedding, x -> isnan(x) or not isfinite(x))) > 0",
    )
    assert bad == 0


def test_events_user_cardinality_in_hll_exact_regime(con):
    """hll_sketch_union_distinct is EXACT-REGIME oracled: a DataSketches
    HLL at lgK=14 stays in sparse/exact mode well past the fixture's
    user cardinality, so estimate == exact count and the hash compare
    holds. If a regenerated fixture pushes distinct users toward the
    dense-mode transition (~k/2 = 8192), the oracle must switch to an
    error-bound check instead — fail loudly before that."""
    assert one(con, "select count(distinct user_id) from events") <= 4000


def test_embeddings_no_zero_vectors(con):
    """Spark's cosine() maps a zero vector to 0.0 but the DuckDB oracles
    divide by the norm product (NaN) — equivalence holds only because no
    zero vector exists."""
    assert (
        one(
            con,
            "select count(*) from embeddings "
            "where list_dot_product(list_transform(embedding, x -> x::DOUBLE),"
            " list_transform(embedding, x -> x::DOUBLE)) = 0",
        )
        == 0
    )


def test_embeddings_query_and_seed_rows_exist(con):
    """vec_id=0 is the fixture query vector (_fixture_query_vec); vec_id
    1..16 are the frozen quantizer seeds every IVF/PQ entry and the
    round-8 Lloyd training start from (_FIXED_SEED_IDS)."""
    assert one(con, "select count(*) from embeddings where vec_id = 0") == 1
    assert (
        one(con, "select count(distinct vec_id) from embeddings "
                 "where vec_id between 1 and 16")
        == 16
    )


def test_embeddings_vec_id_unique(con):
    assert one(con, "select count(*) - count(distinct vec_id) from embeddings") == 0


# ---------------------------------------------------------------------------
# lineitem / orders (TPC-H batch)
# ---------------------------------------------------------------------------


def test_lineitem_money_cents_headroom(con):
    """Every TPC-H entry floor-quantizes revenue terms to bigint cents
    (x * 1e4); the per-corpus SUM must stay far inside int64 on Spark
    while DuckDB runs HUGEINT. 100x headroom on the full-table sum."""
    total = one(
        con,
        "select sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)"
        " as bigint)) from lineitem",
    )
    assert abs(total) < (1 << 63) // 100


def test_lineitem_no_null_keys_or_measures(con):
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount", "l_quantity", "l_shipdate", "l_returnflag",
    ]
    pred = " or ".join(f"{c} is null" for c in cols)
    assert one(con, f"select count(*) from lineitem where {pred}") == 0


def test_discount_is_exact_decimal_in_double(con):
    """Q19/Q1-style predicates compare l_discount against literals like
    0.05; equivalence across engines relies on discounts being stored as
    doubles representing 2-dp decimals (x*100 integral), so both engines
    see bit-identical constants."""
    assert (
        one(
            con,
            "select count(*) from lineitem "
            "where abs(l_discount * 100 - round(l_discount * 100, 0)) > 1e-9",
        )
        == 0
    )


def test_fixture_tables_are_single_parquet_files(con):
    """Every sf fixture table must be ONE parquet file: each oracle's
    read_parquet view names the file path directly, and several
    entries' docstrings reason from the single-file contract. (r16:
    input_file_skew no longer depends on this — it materializes its own
    bucketed lake and its oracle replays the bucketing logically — but
    the fixture contract stays load-bearing for the views.)"""
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(con.sf_dir, f"{t}.parquet")
        assert os.path.isfile(p), (
            f"{p} is not a single parquet FILE — input_file_skew's "
            "oracle (and every read_parquet view) assumes one file per "
            "table"
        )
