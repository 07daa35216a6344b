#!/usr/bin/env python
"""Artifact-consumer plan audit (VERDICT r16 item 5).

The eval_split_decontaminated incident generalizes: materializing a
substrate (signatures, shingles, IVF/PQ index) gives the optimizer REAL
size statistics, and a previously-implicit join strategy can silently
flip — at sf10 the flip re-opened a rejected broadcast plan and cost
32x. This audit mechanically derives every registry entry that consumes
a persisted artifact (``_cached_ann_index`` or a helper wrapping it,
discovered by AST walk so new consumers enroll automatically), builds
each entry's executed plan at the given fixture, and flags the
dangerous shape:

    BroadcastExchange
      ... subtree contains an InMemoryTableScan (the persisted
          artifact read) with NO bounding operator (aggregate / limit /
          top-k) between them

when any artifact consumed by that entry is larger on disk than
``spark.sql.autoBroadcastJoinThreshold`` — i.e. the plan proposes
broadcasting a corpus-scaled artifact. At tiny fixtures artifacts sit
under the threshold and broadcasts are the WANTED plan, so the audit
passes vacuously there; run it against the scaled fixtures (sf1/sf10,
see BASELINE.md census) where the flip class is visible.

Usage:
    python scripts/artifact_consumer_audit.py [--sf-dir DIR] [--only a,b]

Exit 0 iff no violations. One JSON summary line last.
"""
from __future__ import annotations

import argparse
import ast
import glob
import inspect
import json
import os
import re
import sys
import tempfile
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT_FNS = {
    "_cached_ann_index",
    "_cached_minhash_sigs",
    "_cached_simhash_table",
    "_cached_shingle3",
}

#: r18 (VERDICT r17 item 7): every artifact lane keeps an UNCACHED timed
#: control — an entry (or bench pseudo-query) that derives the lane's
#: substrate inline so the bench always carries the honest derivation
#: cost next to the artifact-served consumers. This table is the
#: CONTRACT: controls_audit() fails if a control disappears or its code
#: starts reaching an artifact read (directly or through one wrapper
#: level). Moving one of these onto an artifact requires updating this
#: table in the same commit — i.e. explicitly, never silently.
UNCACHED_CONTROLS = {
    # minhash/simhash signature lane (BASELINE.md r15 table: "control:
    # dedup_minhash_pairs (raw, UNcached by design)")
    "signatures": [("bench", "_dedup_minhash_pairs")],
    # 3-gram shingle lane (BASELINE.md r16 table: ngram_jaccard keeps
    # the inline derivation "and doubles as the uncached headline
    # control"; containment_capped is the second inline face)
    "shingle3": [
        ("entry", "dedup_ngram_jaccard"),
        ("entry", "dedup_containment_capped"),
    ],
    # ANN index lane (IVF/PQ/LSH): the exact brute-force path stays
    # inline — both as its own headline entry and as the exact arm the
    # recall evals re-derive per invocation
    "ann_index": [("entry", "sim_bruteforce_topk")],
}

#: operators that bound a subtree's output regardless of input size —
#: a broadcast of a bounded derivation of an artifact is fine
BOUNDING = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def _called_names(fn) -> set[str]:
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (TypeError, OSError):
        return set()
    out: set[str] = set()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name):
                out.add(f.id)
            elif isinstance(f, ast.Attribute):
                out.add(f.attr)
    return out


def consumer_entries() -> list[str]:
    """Registry entries that reach an artifact read, directly or through
    one level of registry-module helper (the sanctioned _cached_* /
    _frame wrappers)."""
    import database_extractor_spark.registry as reg
    from database_extractor_spark.registry import QUERIES

    wraps = set()
    for nm in dir(reg):
        obj = getattr(reg, nm)
        if (
            callable(obj)
            and nm.startswith("_")
            and getattr(obj, "__module__", "").startswith(
                "database_extractor_spark.registry"
            )
            and _called_names(obj) & ARTIFACT_FNS
        ):
            wraps.add(nm)
    targets = ARTIFACT_FNS | wraps
    return [n for n, fn in QUERIES.items() if _called_names(fn) & targets]


def controls_audit() -> dict:
    """Spark-free check of the UNCACHED_CONTROLS contract: each declared
    control still exists AND still derives its substrate inline (no
    artifact-fn reach, directly or through one registry-helper level).
    Returns {"ok": bool, "violations": [...]}; wired into
    verify_all --quick so a silent lane switch fails the round gate."""
    import database_extractor_spark.registry as reg
    from database_extractor_spark.registry import QUERIES

    wraps = set()
    for nm in dir(reg):
        obj = getattr(reg, nm)
        if (
            callable(obj)
            and nm.startswith("_")
            and getattr(obj, "__module__", "").startswith(
                "database_extractor_spark.registry"
            )
            and _called_names(obj) & ARTIFACT_FNS
        ):
            wraps.add(nm)
    targets = ARTIFACT_FNS | wraps

    violations = []
    for lane, controls in UNCACHED_CONTROLS.items():
        for kind, name in controls:
            if kind == "entry":
                fn = QUERIES.get(name)
                if fn is None:
                    violations.append(
                        {"lane": lane, "control": name, "problem": "entry removed"}
                    )
                    continue
            else:  # bench pseudo-query
                import bench as B

                fn = getattr(B, name, None)
                if fn is None:
                    violations.append(
                        {"lane": lane, "control": name,
                         "problem": "bench pseudo-query removed"}
                    )
                    continue
                # the pseudo-query is appended to the timed secondary
                # list inside main() (bench.py:469) — check the source
                # so this stays a spark-free static assertion
                bench_src = inspect.getsource(B)
                if f'secondary_fns.append(("{name.lstrip("_")}"' not in bench_src:
                    violations.append(
                        {"lane": lane, "control": name,
                         "problem": "no longer timed by bench.py"}
                    )
            hit = _called_names(fn) & targets
            if hit:
                violations.append(
                    {"lane": lane, "control": name,
                     "problem": f"switched to artifact: {sorted(hit)}"}
                )
    return {"ok": not violations, "violations": violations,
            "lanes": {k: [n for _k, n in v] for k, v in UNCACHED_CONTROLS.items()}}


def _node_depth(line: str) -> tuple[int, str] | None:
    m = re.match(r"^([\s:+|-]*)([A-Za-z(].*)$", line)
    if not m:
        return None
    return len(m.group(1)), m.group(2)


def unbounded_artifact_broadcasts(plan: str) -> list[str]:
    """BroadcastExchange subtrees that contain an InMemoryTableScan with
    no bounding operator above it (within the subtree)."""
    lines = plan.splitlines()
    parsed = [(_node_depth(ln), ln) for ln in lines]
    bad = []
    for i, (nd, _ln) in enumerate(parsed):
        if nd is None or not nd[1].startswith("BroadcastExchange"):
            continue
        depth = nd[0]
        subtree = []
        for j in range(i + 1, len(parsed)):
            nd2 = parsed[j][0]
            if nd2 is None:
                continue
            if nd2[0] <= depth:
                break
            subtree.append(nd2)
        # path from broadcast down to each InMemoryTableScan: bounded if
        # ANY bounding op sits in the subtree at a depth above the scan
        scans = [d for d, t in subtree if t.startswith("InMemoryTableScan")]
        if not scans:
            continue
        bounded = any(
            t.startswith(BOUNDING) for _d, t in subtree
        )
        if not bounded:
            bad.append(nd[1][:80])
    return bad


def max_artifact_bytes(sf_dir: str) -> int:
    """Largest on-disk artifact belonging to THIS fixture (artifacts are
    keyed by table-content fingerprint; /tmp also holds other fixtures'
    artifacts, which must not inflate the measurement)."""
    from database_extractor_spark.registry._base import _parquet_fingerprint

    fps = set()
    for t in ("embeddings", "documents"):
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            fps.add(_parquet_fingerprint(sf_dir, t))
    tmp = tempfile.gettempdir()
    best = 0
    for fp in fps:
        for d in glob.glob(os.path.join(tmp, f"ann_index_*_{fp}")):
            total = 0
            for root, _dirs, files in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
            best = max(best, total)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.session import create_spark_client

    spark = create_spark_client()
    thresh_conf = spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold"
    ).lower()
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "b": 1}
    if thresh_conf[-1] in units:
        thresh = int(thresh_conf[:-1]) * units[thresh_conf[-1]]
    else:
        thresh = int(thresh_conf)
    names = args.only.split(",") if args.only else consumer_entries()
    out = {"consumers": len(names), "violations": [], "rows": {}}
    for name in names:
        try:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            out["violations"].append({"entry": name, "error": repr(exc)[:200]})
            continue
        hits = unbounded_artifact_broadcasts(plan)
        row = {
            "bcast": plan.count("BroadcastExchange"),
            "reuse": plan.count("ReusedExchange"),
            "unbounded_artifact_bcast": len(hits),
        }
        out["rows"][name] = row
        if hits:
            # dangerous only when the artifact is genuinely over the
            # broadcast threshold — below it the broadcast IS the plan
            # a 100 TB operator would also want for that bounded side
            art = max_artifact_bytes(args.sf_dir)
            row["max_artifact_bytes"] = art
            if art > thresh:
                out["violations"].append({"entry": name, "nodes": hits})
        print(f"{name}: {row}", flush=True)
    out["ok"] = not out["violations"]
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
