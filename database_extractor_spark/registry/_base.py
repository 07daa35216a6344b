"""The driver-contract registry: one named query per implemented operator,
each paired (where SQL-expressible) with an independent DuckDB oracle.

Conventions that keep the driver's row-count + schema + value-hash compare
green across two engines:

- Every computed column is aliased IDENTICALLY in the Spark plan and the
  oracle SQL.
- Sums/averages of doubles go through DECIMAL casts (exact, order
  independent) and back to double — see operators.relational.exact_sum.
- Per-row arithmetic uses the SAME expression sequence on both sides:
  IEEE double ops are deterministic, so identical formulas on identical
  inputs produce bit-identical doubles (rounding is then safe).
- Ratios/hashes avoid engine-specific functions (xxhash64) in oracled
  entries; md5 and plain arithmetic are portable. MinHash/SimHash/LSH
  derive every hash from md5 since round 7 (operators/dedup.py module
  docstring), so they carry FULL oracles. Round 8 closed the last
  rows-only gap: the trained ANN pair (sim_ivf_kmeans / sim_pq_topk) now
  trains by DETERMINISTIC Lloyd rounds (frozen seed init, fixed round
  count, 6-dp mean rounding — similarity.lloyd_rounds_*), so its oracles
  unroll training as chained CTEs; every registry entry has an oracle.
- count() is BIGINT on both sides; DuckDB SUM(int) would be HUGEINT, so
  integer sums are explicitly cast to BIGINT in the SQL.
"""

from __future__ import annotations

import datetime
import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_extractor_spark.extract import query_database
from database_extractor_spark.operators import core as C
from database_extractor_spark.operators import dedup as D
from database_extractor_spark.operators import relational as R
from database_extractor_spark.operators import similarity as S
from database_extractor_spark.operators import text as T
from database_extractor_spark.sources import read_source
from database_extractor_spark import timeutil

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
TIME_FMT = "%Y-%m-%dT%H:%M:%SZ"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_source(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _path_bytes(path: str) -> int:
    """On-disk bytes of a fixture table (single file or multi-part
    directory) — the cheap driver-side stat that gates SF-linear
    broadcasts (ADVICE r16: a dim that grows with SF must fall back to
    a shuffle join past a size threshold instead of OOMing)."""
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(path, p))
            for p in os.listdir(path)
            if p.endswith(".parquet")
        )
    return os.path.getsize(path) if os.path.exists(path) else 0


_QVEC_CACHE: dict[str, tuple[list[float], int]] = {}


def _fixture_query_vec(sf_dir: str) -> tuple[list[float], int]:
    """(embedding, label) of the fixture's vec_id=0 query vector, read
    driver-side via pyarrow and cached per fixture CONTENT fingerprint —
    a one-row parameter lookup should not cost a Spark job per sim_*
    invocation (the operator API itself takes a literal vector; see
    similarity.brute_force_topk). Content-keyed since r12: the vector
    becomes a plan literal, so a fixture regenerated in place must
    invalidate it (the r11-ADVICE staleness class)."""
    key = _parquet_fingerprint(sf_dir, "embeddings")
    if key not in _QVEC_CACHE:
        import pyarrow.parquet as pq

        row = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding", "label"],
            filters=[("vec_id", "=", 0)],
        ).to_pylist()[0]
        _QVEC_CACHE[key] = ([float(x) for x in row["embedding"]], int(row["label"]))
    return _QVEC_CACHE[key]


# ==========================================================================


def _parquet_fingerprint(sf_dir: str, table: str) -> str:
    """16-hex CONTENT fingerprint of one fixture parquet file: absolute
    path + file size + md5 of the footer bytes (last 64 KiB — where
    row-group stats, offsets and the schema live; any data change
    perturbs it). One small read, not a full-file scan. This is the
    staleness key every cross-session/trained-state cache must use
    instead of the bare sf_dir string: a fixture regenerated in place —
    even with preserved mtime (tar/rsync -t, build caches) — produces a
    different key, so stale trained state (DPP lake layout, BPE merges,
    IVF/PQ codebooks) can never be served against new data (ADVICE
    r8/r9/r11)."""
    import glob as _glob
    import hashlib

    src = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    # a scaled fixture's table is a multi-part DIRECTORY (.sf1/.sf10 via
    # make_scaled_fixture); fold every part's (name, size, footer) into
    # one digest, sorted for determinism — still only 64 KiB per part
    parts = (
        sorted(_glob.glob(os.path.join(src, "*.parquet")))
        if os.path.isdir(src)
        else [src]
    )
    h = hashlib.md5(src.encode())
    for p in parts:
        st = os.stat(p)
        with open(p, "rb") as f:
            f.seek(max(0, st.st_size - 65536))
            tail = f.read(65536)
        h.update(f"|{os.path.basename(p)}|{st.st_size}|".encode() + tail)
    return h.hexdigest()[:16]

