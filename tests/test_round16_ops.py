"""Round-16 additions: Poisson-bootstrap CI and Cohen's kappa."""

import hashlib
import os

from tests.conftest import SF_DIR


def test_metric_bootstrap_ci_python_replay(spark):
    """Full independent replay of the Poisson bootstrap in pure Python:
    same md5 millionth-lane, same inverse-CDF thresholds, same
    per-replicate weighted means — the entry's one row must reproduce
    exactly (6-dp roundings included)."""
    import pandas as pd

    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.registry.stats_ops import (
        _N_BOOT_REPS,
        _POIS1_CDF_PPM,
    )

    row = QUERIES["metric_bootstrap_ci"](spark, SF_DIR).collect()[0]

    pdf = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))[
        ["doc_id", "n_chars"]
    ]
    ests = []
    for b in range(_N_BOOT_REPS):
        sw = tw = 0
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            u = (
                int(hashlib.md5(f"{doc_id}-{b}".encode()).hexdigest()[:8], 16)
                % 1000000
            )
            w = sum(1 for t in _POIS1_CDF_PPM if u >= t)
            sw += w * int(n_chars)
            tw += w
        if tw > 0:
            ests.append(round(sw / tw, 6))
    assert row["n_docs"] == len(pdf)
    assert row["n_replicates"] == len(ests) == _N_BOOT_REPS
    assert row["point_mean"] == round(float(pdf["n_chars"].mean()), 6)
    assert row["boot_mean"] == round(sum(ests) / len(ests), 6)
    # interpolated 2.5/97.5 quantiles, index p*(n-1) (percentile /
    # quantile_cont semantics)
    s = sorted(ests)

    def q(p):
        i = p * (len(s) - 1)
        lo, hi = int(i), min(int(i) + 1, len(s) - 1)
        return round(s[lo] + (i - lo) * (s[hi] - s[lo]), 6)

    assert row["ci_lo"] == q(0.025)
    assert row["ci_hi"] == q(0.975)
    assert row["ci_lo"] <= row["boot_mean"] <= row["ci_hi"]


def test_rater_agreement_kappa_replays_from_component_raters(spark):
    """The kappa row must reproduce from the two component entries'
    own outputs (contingency counts) and satisfy the kappa identity
    (po - pe)/(1 - pe) at 6 dp."""
    from database_extractor_spark.registry import QUERIES

    row = QUERIES["rater_agreement_kappa"](spark, SF_DIR).collect()[0]
    g = {
        r["doc_id"]: r["keep"]
        for r in QUERIES["gopher_quality_filter"](spark, SF_DIR).collect()
    }
    q = {
        r["doc_id"]: r["quality_pass"]
        for r in QUERIES["quality_classifier_score"](spark, SF_DIR).collect()
    }
    both = [d for d in g if d in q and q[d] is not None]
    n11 = sum(1 for d in both if g[d] and q[d])
    n10 = sum(1 for d in both if g[d] and not q[d])
    n01 = sum(1 for d in both if not g[d] and q[d])
    n00 = sum(1 for d in both if not g[d] and not q[d])
    n = len(both)
    assert (row["n_docs"], row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    assert row["po"] == round(po, 6)
    assert row["pe"] == round(pe, 6)
    if pe == 1.0:
        assert row["kappa"] is None
    else:
        assert abs(row["kappa"] - (po - pe) / (1 - pe)) < 2e-6
        assert row["kappa"] <= 1.0


def test_facility_location_greedy_python_replay(spark):
    """Full independent replay of the facility-location greedy in pure
    Python/numpy: same 1e6 quantization, same candidate pool rule, same
    exact-integer coverage sums and id tie-breaks — ranks, ids, and
    coverage values must reproduce exactly."""
    import numpy as np
    import pandas as pd

    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.registry.stats_ops import (
        _FL_K,
        _FL_POOL,
    )

    rows = QUERIES["facility_location_coreset"](spark, SF_DIR).collect()

    pdf = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    E = {
        int(r.vec_id): np.array(
            [round(float(x) * 1e6) for x in r.embedding], dtype=np.int64
        )
        for r in pdf.itertuples()
    }
    cand_ids = sorted(v for v in E if v % 16 == 1)[:_FL_POOL]
    cover = {x: 0 for x in E}
    selected: list[int] = []
    expect = []
    while len(expect) < _FL_K and len(selected) < len(cand_ids):
        best = None
        for c in cand_ids:
            if c in selected:
                continue
            gain = sum(
                max(cover[x], int(E[x] @ E[c])) for x in E
            )
            if best is None or (gain, -c) > (best[0], -best[1]):
                best = (gain, c)
        gain, c = best
        selected.append(c)
        for x in E:
            cover[x] = max(cover[x], int(E[x] @ E[c]))
        expect.append((len(expect) + 1, c, float(gain)))
    got = [(r["rank"], r["vec_id"], r["coverage"]) for r in rows]
    assert got == expect
    # coverage is monotone nondecreasing (submodular greedy invariant)
    covs = [g for _, _, g in got]
    assert covs == sorted(covs)


def test_canary_leak_scan_python_replay(spark):
    """Pure-Python replay of the needle extraction and containment /
    occurrence counts; every planted canary must hit at least its own
    source document."""
    import pandas as pd

    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.registry.stats_ops import (
        _CANARY_LEN,
        _CANARY_SRC_DOCS,
    )

    rows = {
        r["canary_id"]: r
        for r in QUERIES["canary_leak_scan"](spark, SF_DIR).collect()
    }
    pdf = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))[
        ["doc_id", "text"]
    ]
    texts = {
        int(r.doc_id): r.text for r in pdf.itertuples() if r.text is not None
    }
    for i, d in enumerate(_CANARY_SRC_DOCS, start=1):
        src = texts.get(d)
        # strip(' ') not strip(): both engines trim SPACES only (F.trim /
        # DuckDB trim), so the replay must not strip tabs/newlines that
        # the engines would keep (ADVICE r16)
        needle = src.strip(" ")[:_CANARY_LEN] if src is not None else ""
        if not needle:
            assert rows[i]["n_docs_hit"] == 0 == rows[i]["n_occurrences"]
            continue
        hits = [t for t in texts.values() if needle in t]
        occs = sum(t.count(needle) for t in hits)
        assert rows[i]["src_doc_id"] == d
        assert rows[i]["needle_len"] == len(needle)
        assert rows[i]["n_docs_hit"] == len(hits) >= 1
        assert rows[i]["n_occurrences"] == occs >= 1


def test_eval_split_dfcap_joinback_stays_sortmerge(spark):
    """The df-cap join-back's merge hint is LOAD-BEARING (BASELINE r16):
    the shingle artifact's real parquet statistics made AQE re-plan the
    join-back as a BroadcastHashJoin — the formulation the r15 sf10
    shoot-out measured at 352 s (vs 15.7 s shipped) — while sf0.1
    looked fine. Pin the shape: every __df-cap filter must feed a Sort
    on the shingle key (an SMJ input), never a BroadcastExchange."""
    import re

    from database_extractor_spark.registry import QUERIES

    df = QUERIES["eval_split_decontaminated"](spark, SF_DIR)
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
    cap_lines = [
        i for i, l in enumerate(lines) if "Filter" in l and "__df" in l
    ]
    assert cap_lines, "df-cap filter missing from the plan"
    for i in cap_lines:
        above = "\n".join(lines[max(0, i - 3) : i])
        assert re.search(r"Sort \[s#\d+L ASC", above), (
            "df-cap filter is not an SMJ input:\n" + above
        )
        assert "BroadcastExchange" not in above, (
            "df-cap join-back re-planned as broadcast — the rejected "
            "352 s formulation:\n" + above
        )


def test_ivf_index_maintenance_invariants(spark):
    """Cohort counts must partition the corpus exactly; growth is the
    exact integer ppm of each list's cohort counts; the md5 incoming
    bucket replays from the entry's own assignment universe."""
    import hashlib

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["ivf_index_maintenance"](spark, SF_DIR).collect()
    n_vecs = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).count()
    assert sum(r["n_total"] for r in rows) == n_vecs
    for r in rows:
        assert r["n_existing"] + r["n_incoming"] == r["n_total"]
        if r["n_existing"] == 0:
            assert r["growth_ppm"] is None
        else:
            assert r["growth_ppm"] == (
                1000000 * r["n_incoming"]
            ) // r["n_existing"]
    # the incoming cohort is the deterministic md5 %5 bucket
    n_inc = sum(r["n_incoming"] for r in rows)
    expect_inc = sum(
        1
        for v in range(n_vecs)
        if int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 5 == 0
    )
    assert n_inc == expect_inc
