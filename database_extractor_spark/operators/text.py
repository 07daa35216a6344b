"""Text analysis for training-data pipelines: tokenization stats, quality
scoring, language ID, document fingerprinting.

Not in the reference (it is a numeric time-series extractor); these are the
north-star LLM-pipeline operators over the ``documents`` table. Design rule:
everything here is built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs anywhere, so a 100 TB corpus scan
stays a single embarrassingly-parallel stage with no Arrow hops.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword-vote language
#: heuristic. Deliberately small: language ID at corpus scale is a
#: prefilter, not a classifier — anything ambiguous should fall through to
#: "und" and a downstream model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"],
}

_WS = r"\s+"


def _lit_str_array(words) -> Column:
    """array<string> literal from ONE expr string — a single Py4J call
    instead of one per word (the _query_lit discipline; callers pass
    alphabetic stopword lists, asserted here so quoting stays trivial)."""
    ws = list(words)
    assert all(w.isalpha() for w in ws), ws
    return F.expr("array(" + ",".join(f"'{w}'" for w in ws) + ")")


def tokens(col: Column) -> Column:
    """Whitespace tokenization -> array<string>. The BPE-ish variant below
    (``subword_token_count``) approximates subword counts with a regex."""
    return F.split(F.trim(col), _WS)


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens / n_chars / mean token length per document.

    Scale: per-row narrow transforms only — no shuffle, full codegen.
    """
    t = tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(t))
        .withColumn("n_chars_calc", F.length(F.col(text_col)))
        .withColumn(
            "mean_token_len",
            F.round(
                (F.length(F.regexp_replace(F.col(text_col), _WS, "")))
                / F.greatest(F.size(t), F.lit(1)),
                4,
            ),
        )
    )


def subword_token_count(col: Column) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: count
    alternating letter-runs / digit-runs / single punctuation marks, the
    units a byte-pair tokenizer rarely crosses. Cheap upper-ish bound used
    for budget accounting in data pipelines."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def with_quality_score(df: DataFrame, text_col: str = "text", lang: str = "en") -> DataFrame:
    """Heuristic quality signals: length, punctuation ratio, stopword ratio,
    alphabetic ratio — the classic cheap filters (C4/Gopher-style) that run
    before any model-based scoring.

    Output columns: punct_ratio, alpha_ratio, stopword_ratio, quality_ok.
    """
    txt = F.col(text_col)
    n_chars = F.greatest(F.length(txt), F.lit(1))
    toks = tokens(F.lower(txt))
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop_arr = _lit_str_array(STOPWORDS[lang])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct = F.length(F.regexp_replace(txt, r"[^!-/:-@\[-`{-~]", ""))
    alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))

    out = (
        df.withColumn("punct_ratio", F.round(punct / n_chars, 4))
        .withColumn("alpha_ratio", F.round(alpha / n_chars, 4))
        .withColumn("stopword_ratio", F.round(n_stop / n_toks, 4))
    )
    return out.withColumn(
        "quality_ok",
        (F.length(txt) >= 20)
        & (F.col("punct_ratio") <= 0.3)
        & (F.col("alpha_ratio") >= 0.5),
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID: the language whose stopword list scores
    the most hits wins; ties and zero-hit rows -> 'und'.

    Scale: per-row expression over a handful of tiny literal arrays —
    no shuffle, no UDF, no model. Suitable as a 100 TB prefilter.

    The tokenization and the per-language hit counts are materialized as
    intermediate COLUMNS rather than folded into one expression: a
    greatest-of-structs tree that inlines its inputs re-evaluates the
    split+filter subtree at every reference (~28 tokenizations per row in
    the folded form — higher-order-function lambdas defeat both codegen
    subexpression elimination and CollapseProject's cheap-expr inlining,
    precisely BECAUSE the aliases below are non-cheap and multi-referenced
    they stay materialized). r18: 2.25 -> 0.66 s on the confusion eval,
    identical lang_pred on every row.
    """
    langs = sorted(STOPWORDS)
    out = df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    for lang in langs:
        arr = _lit_str_array(STOPWORDS[lang])
        out = out.withColumn(
            f"__h_{lang}",
            F.size(F.filter(F.col("__toks"), lambda t: F.array_contains(arr, t))),
        )
    hit_cols = [F.col(f"__h_{lang}") for lang in langs]
    # strict winner over ints: ties and zero hits -> 'und' (langs is
    # sorted, so the coalesce picks the same winner the old
    # greatest-of-(hits, lang)-structs picked — on a strict winner the
    # tiebreak order is irrelevant)
    out = out.withColumn("__best", F.greatest(*hit_cols))
    n_best = sum(F.when(h == F.col("__best"), 1).otherwise(0) for h in hit_cols)
    winner = F.coalesce(
        *[F.when(h == F.col("__best"), F.lit(lang)) for lang, h in zip(langs, hit_cols)]
    )
    out = out.withColumn(
        out_col,
        F.when((F.col("__best") > 0) & (n_best == 1), winner).otherwise("und"),
    )
    return out.drop("__toks", "__best", *[f"__h_{lang}" for lang in langs])


def with_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed). The canonical exact-dedup key —
    content-addressed, stable across engines (md5 is everywhere), and
    joinable/groupable at scale (128-bit hex vs arbitrary-length text).
    """
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " ")
    return df.withColumn(out_col, F.md5(normalized))


def rolling_hashes(col: Column, window: int = 8) -> Column:
    """Array of rolling ``window``-token gram fingerprints, position-indexed:
    element ``i`` (0-based) is the hash of tokens ``[i, i+window)``. The
    hash is the PORTABLE 60-bit md5 slice (15 hex chars -> non-negative
    bigint — same lane as operators.dedup), so a DuckDB oracle replays
    every gram bit-identically::

        ('0x' || substr(md5(array_to_string(t[i:i+window-1], ' ')), 1, 15))::bigint

    Documents shorter than ``window`` tokens emit an EMPTY array (no
    partial-gram hash): a sub-window document cannot contain a
    ``window``-token duplicate span, and a whole-doc fallback hash would
    overstate match length downstream.

    Consumed by exact-substring dedup (operators.dedup.
    exact_substring_spans): posexplode gives (position, gram-hash) pairs,
    the unit of the duplicate-span inverted index.
    """
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - window)
    grams = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    return F.when(n >= window, grams).otherwise(F.array().cast("array<long>"))


def token_frequencies(df: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Corpus token frequency table (the explode->count classic).

    Scale: explode multiplies rows by tokens/doc before the aggregation
    shuffle; partial aggregation collapses most of it map-side. For very
    hot tokens AQE skew handling keeps reducers balanced.
    """
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .count()
        .filter(F.col("count") >= min_count)
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Corpus vocabulary table: (token, n, band, band_rank) for every token
    with corpus frequency >= ``min_count``, totally ordered by
    (frequency desc, token) through the (band desc, band_rank) pair.

    A single global ``row_number() over (order by n desc)`` would funnel
    the whole vocabulary through ONE task (and the registry plan lint
    rejects unpartitioned windows outright). Instead the ranking window is
    PARTITIONED by ``band = floor(log2(n))`` — the frequency octave — so
    each band ranks in parallel, and (band desc, band_rank asc, with ties
    broken by token) reproduces the exact global frequency order. Consumers
    needing one integer id join against the tiny per-band size table to
    add offsets; the (band, band_rank) pair is already a stable unique key.
    """
    freq = token_frequencies(df, text_col, min_count).withColumnRenamed("count", "n")
    banded = freq.withColumn("band", F.floor(F.log2("n")).cast("int"))
    w = Window.partitionBy("band").orderBy(F.col("n").desc(), F.col("token"))
    return banded.select(
        "token",
        "n",
        "band",
        F.row_number().over(w).alias("band_rank"),
    )
