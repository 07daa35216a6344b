"""The driver-contract registry, split into per-domain modules.

Each module registers its entries into the ONE shared QUERIES/ORACLE
pair defined in ``_base`` (decorator ``register``); this package imports
the modules in the original flat-file definition order, re-exports every
module-level name so ``from database_extractor_spark.registry import X``
keeps working for helpers and entries alike, then applies the
driver-visible ordering (``_VERIFY_FIRST`` front).

Conventions that keep the driver's row-count + schema + value-hash
compare green across two engines are documented in ``_base``.
"""

from __future__ import annotations

import sys as _sys

from database_extractor_spark.registry import _base
from database_extractor_spark.registry._base import (
    EVENT_TYPES,
    ORACLE,
    QUERIES,
    TIME_FMT,
    register,
)
from database_extractor_spark.registry import reference_ops
from database_extractor_spark.registry import llm_ops
from database_extractor_spark.registry import timeseries_ops
from database_extractor_spark.registry import relational_ops
from database_extractor_spark.registry import pipeline_ops
from database_extractor_spark.registry import cdc_ops
from database_extractor_spark.registry import tpch_ops
from database_extractor_spark.registry import text_graph_ops
from database_extractor_spark.registry import streaming_bpe_ops
from database_extractor_spark.registry import sharding_ops
from database_extractor_spark.registry import stats_ops

# Re-export every module-level name (public AND private helpers: tests
# and sibling modules import e.g. _triangle_count_plan, _tbl directly
# from this package, exactly as they did from the flat registry.py).
# Later modules win on collision, matching flat-file shadowing.
_pkg = _sys.modules[__name__]
for _m in (_base, reference_ops, llm_ops, timeseries_ops, relational_ops, pipeline_ops, cdc_ops, tpch_ops, text_graph_ops, streaming_bpe_ops, sharding_ops, stats_ops):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            setattr(_pkg, _k, _v)
del _m, _k, _v, _pkg


# Driver-visible ordering
# ==========================================================================
# The driver verifies the FIRST N entries of queries() in dict-insertion
# order (round 2: exactly the first 50). Entries verified in a prior round
# keep that CORRECTNESS_r{N} record, so each round the not-yet-verified
# entries must register first. _VERIFY_FIRST lists them explicitly —
# highest-value first (the LLM-pipeline operators the north star names),
# cheap entries before heavy ones in case the cap is time-based; everything
# not listed follows in definition order (the round-2-green block).

_VERIFY_FIRST = [
    # ---- round-17 front ----
    # Slot 1: the r17 addition (scale-safe MNN via (label, IVF-cell)
    # buckets off the persisted auto-sized quantizer), never
    # driver-verified.
    "mutual_nearest_neighbors_bucketed",
    # Slots 2-3: the two entries whose plans changed this round (ADVICE
    # r16: deterministic canary needle pick; size-gated part broadcast)
    # — changed code re-earns its driver row.
    "canary_leak_scan",
    "market_basket_lift",
    # Slot 4: the r17 addition (split-conformal threshold), locally
    # oracled + tested, queued immediately. (A drift_ks_test draft was
    # withdrawn in-round: ks_test_drift already carries that exact
    # capability — the distinct-capability bar held.)
    "conformal_threshold",
    # Slots 6-7: plans changed in-round by the census fixes
    # (aggregation pushdown; shingle-artifact truth arm) — changed
    # code re-earns its driver row.
    "range_join_counts",
    "dedup_threshold_sweep",
    # ---- stale-cohort rotation (VERDICT r16 item 3): with 358 entries
    # and a 50-slot window, driver evidence must age uniformly — this
    # round re-verifies the STALEST cohorts: the full r9 batch (15
    # entries, 8 rounds stale) and the first 30 of the r10 batch by
    # name (the rest of r10 + r11 lead the r18 queue). All pass the
    # local sweep at HEAD; >=80% of this window predates r12
    # (43/50 = 86%).
    # r9 cohort (complete):
    "cogroup_pandas_asof",
    "collation_ci_group",
    "dedup_exact_substring",
    "dedup_exact_substring_apply",
    "graph_khop_reachability",
    "hll_sketch_union_distinct",
    "lateral_topk_per_key",
    "observed_metrics_extract",
    "pivot_multi_agg",
    "python_datasource_sink_roundtrip",
    "python_datasource_stream_sink",
    "runtime_bloom_join",
    "string_agg_ordered",
    "try_funcs",
    "url_domain_cap",
    # r10 cohort (first 32 by name):
    "approx_distinct",
    "approx_percentile_sketch",
    "cap_per_group",
    "cdc_merge_apply",
    "cumulative_distinct_users",
    "data_quality_checks",
    "dedup_containment",
    "embedding_dedup_clusters",
    "embedding_quantize_int8",
    "entropy_profile",
    "equal_freq_binning",
    "filtered_agg",
    "gap_fill_linear",
    "hard_negative_mining",
    "mixture_weighted_sample",
    "mode_agg",
    "multimodal_resize",
    "null_safe_join",
    "pack_sequences",
    "posexplode_tokens",
    "profile_columns",
    "psi_drift",
    "robust_stats_mad",
    "rolling_median",
    "salted_agg",
    "salted_join_agg",
    "text_bm25",
    "text_edit_distance_pairs",
    "text_lang_id",
]



def _reorder_for_driver() -> None:
    unknown = [n for n in _VERIFY_FIRST if n not in QUERIES]
    if unknown:
        raise AssertionError(f"_VERIFY_FIRST names unknown entries: {unknown}")
    listed = set(_VERIFY_FIRST)
    order = _VERIFY_FIRST + [n for n in QUERIES if n not in listed]
    for d in (QUERIES, ORACLE):
        resorted = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(resorted)


_reorder_for_driver()
