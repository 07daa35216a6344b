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

# Re-export every module-level name (public AND private helpers: tests
# and sibling modules import e.g. _triangle_count_plan, _tbl directly
# from this package, exactly as they did from the flat registry.py).
# Later modules win on collision, matching flat-file shadowing.
_pkg = _sys.modules[__name__]
for _m in (_base, reference_ops, llm_ops, timeseries_ops, relational_ops, pipeline_ops, cdc_ops, tpch_ops, text_graph_ops, streaming_bpe_ops, sharding_ops):
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
    # ---- round-14 front (VERDICT r13 item 1): the 41 round-13
    # additions — every entry that has NEVER had a driver correctness
    # row (each passes the local full-registry DuckDB oracle sweep +
    # per-entry tests) — followed by the 6 deferred/touched entries.
    # Together 47 of the 50-slot window; the remaining slots go to
    # round-14 additions appended at the end of this block.
    # never-driver-verified (41, r13 additions):
    "sim_ivf_auto",
    "sim_lsh_recall_eval",
    "text_repetition_scores",
    "gopher_quality_filter",
    "corpus_shard_manifest",
    "corpus_export_order",
    "length_outlier_filter",
    "bitmap_exact_distinct",
    "interval_coalesce",
    "ngram_pmi_collocations",
    "ngram_diversity_profile",
    "tokenizer_fertility_eval",
    "simhash_quality_eval",
    "corpus_slice_jsd",
    "event_path_trigrams",
    "mixture_epoch_plan",
    "dedup_threshold_sweep",
    "user_rfm_segments",
    "approx_topk_heavy_hitters",
    "sql_parameterized",
    "sql_pivot_clause",
    "streaming_bitmap_distinct",
    "pack_efficiency_eval",
    "ngram_novelty_ratio",
    "csv_corrupt_records",
    "attribution_last_touch",
    "activity_heatmap",
    "event_path_markov",
    "funnel_latency_percentiles",
    "dup_cluster_histogram",
    "per_source_quality_report",
    "sql_join_hints",
    "lang_id_confusion_eval",
    "quality_gate_agreement",
    "higher_order_funcs",
    "json_corrupt_records",
    "eval_split_decontaminated",
    "embedding_norm_outliers",
    "sql_identifier_clause",
    "tpch_refresh_functions",
    "order_to_ship_latency",
    # deferred from the r13 window (3): single-operator set-op plans,
    # untouched since r03, pytest- and sweep-covered every round:
    "set_union",
    "set_intersect",
    "set_except",
    # touched in r13, re-verify (3): ccnet expr-string lnq rebuild;
    # streaming ledger prior-id semi-join rewrite:
    "ccnet_perplexity_buckets",
    "streaming_minhash_dedup",
    "streaming_curation_funnel",
    # ---- round-14 additions (slots 48-50) ----
    "bitmap_distinct_dictionary",
    "sim_filtered_topk",
    "hybrid_rank_fusion",
]
# Round-15 front queue (the window was full at 50): the remaining
# round-14 additions, all locally oracled + tested, never driver-
# verified — incremental_agg_maintenance, inverted_index_postings,
# corpus_snapshot_diff, sql_unpivot_clause, length_bucket_batching,
# k_anonymity_audit, hll_intersection_estimate, join_skew_diagnostic,
# mutual_nearest_neighbors, event_debounce, backfill_todo_ledger,
# content_defined_chunks, user_activity_streaks, ks_test_drift,
# market_basket_lift, quality_score_auc,
# multi_touch_attribution_linear, calibration_reliability,
# embedding_cosine_histogram, ohlc_bars, token_label_chi2,
# embedding_dim_stats, readability_flesch, vocab_growth_curve,
# interarrival_burstiness, benford_digit_profile, cusum_changepoint,
# rolling_correlation, weighted_percentile, token_gini_by_source,
# sql_group_by_all, ewma_event_rate, ivf_silhouette_eval,
# ab_test_proportions, user_retention_curve,
# histogram_quantile_interp, matryoshka_recall_eval,
# revenue_pareto_by_nation, mixture_waterfill_allocation,
# ts_autocorrelation, knn_label_accuracy, geo_rollup_share,
# cohort_revenue_ltv, attribution_time_decay, source_shingle_overlap,
# table_content_checksum, business_days_latency, column_masking_view,
# streaming_ohlc_bars, user_behavior_entropy, input_file_skew,
# erasure_cascade_audit, embedding_centroid_drift,
# order_dispersion_index, dedup_method_agreement,
# streaming_content_checksum, dau_mau_stickiness,
# new_vs_repeat_revenue.


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
