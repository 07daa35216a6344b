"""Operator library: reference-parity core ops, the relational surface
(joins/aggs/windows/set ops), and the LLM-data-pipeline extensions
(dedup, similarity, text, multimodal)."""

from database_extractor_spark.operators.core import (
    deterministic_last,
    downsample_last,
    drop_all_null_rows,
    drop_columns,
    has_min_rows,
    pivot_wide,
    row_predicate,
    sort_by_columns,
    time_range,
    time_shift,
)
from database_extractor_spark.operators.dedup import (
    connected_components,
    edit_distance_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    with_minhash,
)
from database_extractor_spark.operators.relational import (
    aggregate,
    anti_join,
    cube_agg,
    drop_duplicates_ordered,
    except_distinct,
    intersect_distinct,
    join_tables,
    rollup_agg,
    salted_join,
    semi_join,
    top_k,
    top_k_per_group,
    union_all,
    union_distinct,
    unpivot_long,
    with_lag_lead,
    with_running,
)
from database_extractor_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    cosine,
    label_centroids,
    pairwise_similar_lsh,
    partitioned_topk,
)
from database_extractor_spark.operators.text import (
    build_vocab,
    token_frequencies,
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_stats,
)
from database_extractor_spark.operators.timeseries import (
    asof_join,
    ffill_resample,
    range_join,
    scd2_history,
    session_windows,
    sliding_counts,
)

__all__ = [
    # core (reference parity)
    "time_range", "time_shift", "row_predicate", "pivot_wide",
    "deterministic_last", "downsample_last", "drop_all_null_rows",
    "drop_columns", "has_min_rows", "sort_by_columns",
    # relational
    "join_tables", "semi_join", "anti_join", "salted_join", "aggregate",
    "rollup_agg", "cube_agg", "top_k", "top_k_per_group",
    "drop_duplicates_ordered", "union_all", "union_distinct",
    "intersect_distinct", "except_distinct", "unpivot_long",
    "with_running", "with_lag_lead",
    # dedup
    "exact_dedup", "with_minhash", "lsh_candidate_pairs", "minhash_dedup",
    "ngram_jaccard_pairs", "simhash", "simhash_near_pairs",
    "connected_components", "edit_distance_pairs",
    # similarity
    "cosine", "brute_force_topk", "ann_topk_lsh", "partitioned_topk",
    "pairwise_similar_lsh", "label_centroids",
    # text
    "with_token_stats", "with_quality_score", "with_lang_id",
    "with_fingerprint", "token_frequencies", "build_vocab",
    # timeseries
    "asof_join", "ffill_resample", "range_join", "sliding_counts",
    "session_windows", "scd2_history",
]
