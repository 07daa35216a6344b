"""Semantic invariants for the round-4 operators, beyond the registry-wide
oracle compare: the properties the oracle can't state (two-level vocab rank
== global rank, SCD2 intervals tile the timeline, edit-distance symmetry)."""

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from database_extractor_spark.operators.dedup import edit_distance_pairs
from database_extractor_spark.operators.similarity import label_centroids
from database_extractor_spark.operators.text import build_vocab
from database_extractor_spark.operators.timeseries import scd2_history


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_vocab_banded_rank_equals_global_rank(spark, docs):
    """(band desc, band_rank, token) must enumerate tokens in exactly the
    global (n desc, token) order — the whole point of the two-level id."""
    v = build_vocab(docs, min_count=2).toPandas()
    assert len(v) > 0
    by_band = v.sort_values(
        ["band", "band_rank", "token"], ascending=[False, True, True]
    )["token"].tolist()
    global_order = v.sort_values(["n", "token"], ascending=[False, True])[
        "token"
    ].tolist()
    assert by_band == global_order
    # (band, band_rank) is a unique key
    assert not v.duplicated(["band", "band_rank"]).any()
    assert (v["n"] >= 2).all()


def test_vocab_ranking_window_is_partitioned(spark, docs):
    plan = build_vocab(docs)._jdf.queryExecution().executedPlan().toString()
    import re

    assert not re.search(r"Window \[[^\n]*?\], \[\], \[", plan), (
        "vocab ranking must never use an unpartitioned window"
    )


def test_scd2_intervals_tile_per_key(spark, tables):
    """Per user: ordered intervals must chain (valid_to == next valid_from),
    exactly one open interval (the current state), and consecutive states
    must differ."""
    ev = tables["events"]
    hist = scd2_history(ev, "user_id", "event_type", "ts", tiebreak_col="event_id")
    pdf = hist.toPandas().sort_values(["user_id", "valid_from"])
    for uid, g in pdf.groupby("user_id"):
        opens = g["valid_to"].isna().sum()
        assert opens == 1, f"user {uid}: {opens} open intervals"
        closed = g.dropna(subset=["valid_to"])
        nxt = g["valid_from"].iloc[1:].tolist()
        assert closed["valid_to"].tolist() == nxt, f"user {uid}: gaps in timeline"
        states = g["event_type"].tolist()
        assert all(a != b for a, b in zip(states, states[1:])), (
            f"user {uid}: consecutive identical states"
        )


def test_scd2_first_state_is_first_event(spark, tables):
    ev = tables["events"]
    hist = scd2_history(ev, "user_id", "event_type", "ts", tiebreak_col="event_id")
    firsts = (
        hist.groupBy("user_id").agg(F.min("valid_from").alias("valid_from"))
    )
    ev_firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = firsts.join(ev_firsts, "user_id")
    bad = joined.filter(F.col("valid_from") != F.col("first_ts")).count()
    assert bad == 0


def test_edit_distance_pairs_semantics(spark, docs):
    pairs = edit_distance_pairs(docs).toPandas()
    assert (pairs["lev"] <= 64).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    # spot-verify a couple of distances against a pure-Python implementation
    sample = pairs.head(3)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(
            F.col("doc_id").isin([int(x) for x in
                                  sample["id_a"].tolist() + sample["id_b"].tolist()])
        ).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for _, r in sample.iterrows():
        assert lev(texts[r["id_a"]], texts[r["id_b"]]) == r["lev"]


def test_label_centroids_matches_pandas(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = label_centroids(emb).toPandas()
    pdf = emb.select("label", "embedding").toPandas()
    want = {}
    for label, g in pdf.groupby("label"):
        import numpy as np

        mat = np.array([np.asarray(v, dtype="float64") for v in g["embedding"]])
        mean = mat.mean(axis=0)
        for pos0, m in enumerate(mean):
            want[(label, pos0 + 1)] = m
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert abs(r["centroid"] - want[(r["label"], r["pos"])]) < 1e-5
