"""Round-17 additions: scale-safe MNN, ADVICE pins, process guards."""

import os

from tests.conftest import SF_DIR


def test_ngram_jaccard_prederived_sh_matches_default(spark):
    """ADVICE r16: the ``sh`` parameter of ngram_jaccard_pairs (the
    persisted-artifact lane) requires distinct xxhash64'd shingles per
    document, enforced only by docstring — pin the contract by proving
    a caller-derived ``sh`` (built exactly as the default path builds
    it) reproduces the default-path pairs bit-for-bit."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")

    default = ngram_jaccard_pairs(docs, threshold=0.5)
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                shingles(F.col("text"), 3), lambda s: F.xxhash64(s)
            )
        ).alias("s"),
    )
    prederived = ngram_jaccard_pairs(docs, threshold=0.5, sh=sh)

    key = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
    )
    d, p = key(default), key(prederived)
    assert len(d) > 0
    assert d == p


def test_market_basket_lift_broadcast_gate(spark):
    """ADVICE r16: the part dim grows with SF, so the broadcast must be
    gated. At fixture scale the gate keeps the broadcast (plan shows
    BroadcastHashJoin for the dim attach); the gate threshold itself is
    exercised by _path_bytes on the real fixture layout."""
    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.registry._base import _path_bytes

    part_bytes = _path_bytes(os.path.join(SF_DIR, "part.parquet"))
    assert 0 < part_bytes < 512 * 1024 * 1024
    df = QUERIES["market_basket_lift"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_mnn_bucketed_preserves_shared_cell_mutual_pairs(spark):
    """The bucketed variant's pinned invariant: restricting a candidate
    set keeps its max when the max is in the set — so every fixed-label
    mutual pair whose two members land in the SAME IVF cell must
    reappear in the bucketed result. Also: every bucketed pair shares
    label AND cell by construction."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import similarity as S
    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.registry.llm_ops import (
        _auto_seed_vecs,
        _cached_ann_index,
    )

    exact = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["mutual_nearest_neighbors"](spark, SF_DIR).collect()
    }
    bucketed = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["mutual_nearest_neighbors_bucketed"](
            spark, SF_DIR
        ).collect()
    }
    assert bucketed, "bucketed MNN returned no pairs"

    e = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n = S.auto_n_lists(e.count())
    assigned = _cached_ann_index(
        "ivf_auto_mnn_v",
        SF_DIR,
        spark,
        lambda: S.ivf_assign(e, _auto_seed_vecs(SF_DIR, n), vec_col="v"),
    )
    cell = {
        r["vec_id"]: (r["label"], r["__list"])
        for r in assigned.select("vec_id", "label", "__list").collect()
    }
    for a, b in exact:
        if cell[a] == cell[b]:
            assert (a, b) in bucketed, (
                f"shared-cell mutual pair ({a},{b}) lost by bucketing"
            )
    for a, b in bucketed:
        assert cell[a] == cell[b]


def test_artifact_consumer_audit_derivation_and_shapes(spark):
    """VERDICT r16 item 5 plumbing: the artifact-consumer audit must
    (a) mechanically find every known consumer — new consumers enroll
    by construction, so a missing name here means the derivation broke
    — and (b) find no over-threshold unbounded artifact broadcast at
    this fixture (artifacts are tiny here, so any violation means the
    size gate itself broke). The scaled-fixture runs live in the
    BASELINE.md census."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "artifact_consumer_audit",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "artifact_consumer_audit.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    consumers = set(mod.consumer_entries())
    for must in (
        "mutual_nearest_neighbors_bucketed",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "eval_split_decontaminated",
        "ivf_index_maintenance",
        "semdedup_prune",
    ):
        assert must in consumers, f"consumer derivation lost {must}"

    from database_extractor_spark.registry import QUERIES

    art = mod.max_artifact_bytes(SF_DIR)
    for name in ("dedup_minhash_lsh", "mutual_nearest_neighbors_bucketed"):
        plan = (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        hits = mod.unbounded_artifact_broadcasts(plan)
        if hits:
            assert art <= 10 * 1024 * 1024, (
                f"{name}: over-threshold artifact broadcast {hits}"
            )


def test_conformal_threshold_guarantee(spark):
    """The conformal pieces must be internally consistent: k is the
    exact finite-sample index ceil(0.9*(n+1)); qhat is the k-th
    smallest calibration score (replayed in Python); held-out coverage
    sits near the 90% design level (the marginal guarantee)."""
    import hashlib

    import pandas as pd

    from database_extractor_spark.registry import QUERIES

    row = QUERIES["conformal_threshold"](spark, SF_DIR).collect()[0]
    assert row["k"] == (9 * (row["n_cal"] + 1) + 9) // 10
    pdf = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))[
        ["event_id", "event_type", "value"]
    ].dropna(subset=["value"])
    pdf["is_cal"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10 < 8
        for i in pdf["event_id"]
    ]
    cal = pdf[pdf["is_cal"]]
    # decimal-exact mu: sum on the micro-unit integer lattice
    mu = {
        t: (g["value"].mul(1000000).round().astype("int64").sum() / 1e6)
        / len(g)
        for t, g in cal.groupby("event_type")
    }
    scores = sorted(abs(v - mu[t]) for t, v in zip(cal["event_type"], cal["value"]))
    assert row["n_cal"] == len(scores)
    qhat = scores[row["k"] - 1]
    assert row["qhat"] == round(qhat, 6)
    tst = pdf[~pdf["is_cal"]]
    covered = sum(
        1 for t, v in zip(tst["event_type"], tst["value"])
        if t in mu and abs(v - mu[t]) <= qhat
    )
    n_test = sum(1 for t in tst["event_type"] if t in mu)
    assert row["n_test"] == n_test and row["n_covered"] == covered
    assert row["coverage_ppm"] == 1000000 * covered // n_test
    assert row["coverage_ppm"] >= 850000  # near the 90% design level


def test_edit_distance_histogram_bound_is_sound(spark):
    """r17 census fix: the 34-char histogram L1 prefilter must be a
    true lower bound (L1 <= 2*lev), i.e. the filtered plan returns
    exactly the pairs the unbounded Levenshtein returns — replayed in
    Python on the full sf fixture band universe."""
    import pandas as pd

    from database_extractor_spark.registry import QUERIES

    rows = {
        (r["id_a"], r["id_b"]): r["lev"]
        for r in QUERIES["text_edit_distance_pairs"](spark, SF_DIR).collect()
    }
    pdf = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))[
        ["doc_id", "text", "lang", "n_chars"]
    ]
    pdf = pdf[pdf["n_chars"] <= 512]
    pdf["band"] = (pdf["n_chars"] // 64).astype(int)
    # pure-Python DP is ~ms per pair: replay only the two shortest-text
    # bands per lang (the duplicate-dense region) and compare on that
    # subset; the full-universe equality is the DuckDB oracle's job
    keep = (
        pdf.groupby(["lang"])["band"]
        .transform(lambda s: s <= (s.min() + 1))
        .astype(bool)
    )
    pdf = pdf[keep]
    subset = set(pdf["doc_id"])
    rows = {
        p: d for p, d in rows.items() if p[0] in subset and p[1] in subset
    }

    def lev(a, b):
        if a is None or b is None:
            a, b = a or "", b or ""
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expect = {}
    for (_lang, _band), g in pdf.groupby(["lang", "band"]):
        recs = sorted(g[["doc_id", "text"]].itertuples(index=False))
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                d = lev(recs[i].text, recs[j].text)
                if d <= 64:
                    expect[(recs[i].doc_id, recs[j].doc_id)] = d
    assert rows == expect
