#!/usr/bin/env python
"""ONE-COMMAND verification for a judge (VERDICT r13 item 8).

Reproduces the round's headline claims in <10 minutes without reading
BASELINE.md prose:

  1. Driver-contract invariants — entry() runs; queries()/oracle_sql()
     are key-identical; _VERIFY_FIRST leads insertion order; every
     registry module stays under the 4k-line split invariant.
  2. Full registry sweep — EVERY entry compared against its DuckDB
     oracle at sf0.01 (row count + column set + order-insensitive
     values), via scripts/full_registry_sweep.py's comparator.
  3. Machine-readable environment controls — the same window_rank /
     single-thread anchors bench.py records, so a slow box is visible
     as a control excursion rather than a performance claim.

Usage:
    python scripts/verify_all.py [--sf-dir /root/testdata/sf0.01]
                                 [--quick]   # contract + controls only

Exit code 0 iff every check passes. Prints one JSON summary line last.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from full_registry_sweep import (  # noqa: E402
    TABLES,
    frame_key,
    non_driver_comparable_cols,
)


def check_contract() -> dict:
    import glob
    import pathlib

    import __spark_entry__ as E
    import database_extractor_spark.registry as reg

    q, o = E.queries(), E.oracle_sql()
    res = {
        "n_queries": len(q),
        "n_oracles": len(o),
        "keys_identical": set(q) == set(o),
        "verify_first_leads": list(q)[: len(reg._VERIFY_FIRST)]
        == reg._VERIFY_FIRST,
    }
    # VERDICT r14 item 5: machine-check the "never driver-verified" set
    # instead of tracking it in comments. Every entry with no
    # CORRECTNESS_r{N} row across all rounds MUST sit in _VERIFY_FIRST
    # (the driver-window front queue), so a new entry cannot ship
    # without being queued for driver verification. The full sweep
    # below supplies the current-round local evidence for the tail
    # beyond the 50-slot window.
    repo = pathlib.Path(__file__).resolve().parent.parent
    driver_verified: set[str] = set()
    for p in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        driver_verified |= set(json.load(open(p)))
    never = [n for n in q if n not in driver_verified]
    unqueued = [n for n in never if n not in reg._VERIFY_FIRST]
    res["never_driver_verified"] = len(never)
    res["never_verified_beyond_window"] = max(0, len(never) - 50)
    res["unverified_entries_queued"] = not unqueued
    if unqueued:
        print(f"  UNQUEUED never-verified entries: {unqueued}", flush=True)
    sizes = {
        p.name: sum(1 for _ in open(p))
        for p in pathlib.Path(reg.__file__).parent.glob("*.py")
    }
    res["max_module_lines"] = max(sizes.values())
    res["split_invariant"] = res["max_module_lines"] < 4000
    res["ok"] = all(
        res[k]
        for k in (
            "keys_identical",
            "verify_first_leads",
            "split_invariant",
            "unverified_entries_queued",
        )
    )
    return res


def check_sweep_head() -> dict:
    """VERDICT r16 item 2: the committed SWEEP_r{N} artifact must cover
    the code at HEAD. In r16 the final commit rewrote an entry's plan
    AFTER the sweep was recorded, silently lapsing the sweep-at-HEAD
    guarantee (the judge re-swept it by hand). This check fails when the
    newest committed sweep artifact's head is not HEAD *modulo
    artifact-only commits* — i.e. any path changed between the
    artifact's head and HEAD that is not a root-level artifact
    (*.json / *.md) or docs/ means the sweep no longer covers the code.
    Enforced in --quick (the judge's round-close invocation); pass
    --allow-stale-sweep for mid-round contract checks."""
    import glob
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _num(p):
        return int(re.search(r"SWEEP_r(\d+)\.json$", p).group(1))

    sweeps = sorted(glob.glob(os.path.join(repo, "SWEEP_r*.json")), key=_num)
    if not sweeps:
        return {"ok": False, "reason": "no SWEEP_r*.json artifact committed"}
    latest = sweeps[-1]
    art_head = json.load(open(latest)).get("head")
    res = {"artifact": os.path.basename(latest), "artifact_head": art_head}
    if not art_head:
        return {**res, "ok": False, "reason": "artifact has no head field"}

    def _git(*args):
        return subprocess.run(
            ["git", "-C", repo, *args],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()

    try:
        cur = _git("rev-parse", "HEAD")
        art_full = _git("rev-parse", art_head)
    except subprocess.CalledProcessError as exc:
        return {**res, "ok": False, "reason": f"git: {exc.stderr.strip()}"}
    res["head"] = cur[:7]
    if art_full == cur:
        return {**res, "ok": True, "code_paths_changed": []}
    try:
        changed = _git(
            "diff", "--name-only", f"{art_full}..{cur}"
        ).splitlines()
    except subprocess.CalledProcessError as exc:
        return {**res, "ok": False, "reason": f"git diff: {exc.stderr.strip()}"}
    artifact_only = re.compile(r"^(?:[^/]+\.(?:json|md)|docs/.*)$")
    bad = [p for p in changed if not artifact_only.match(p)]
    res["code_paths_changed"] = bad
    res["ok"] = not bad
    if bad:
        res["reason"] = (
            f"{os.path.basename(latest)} was swept at {art_head} but HEAD "
            f"changed code since: {bad[:10]} — re-run verify_all --round N"
        )
    return res


def run_entry_smoke(spark) -> dict:
    import __spark_entry__ as E

    df = E.entry(spark)
    n = df.count()
    return {"rows": n, "cols": len(df.columns), "ok": n >= 0}


def run_sweep(spark, sf_dir: str, only: list[str] | None) -> dict:
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )
    queries, oracles = E.queries(), E.oracle_sql()
    names = only or list(queries)
    out = {"match": 0, "mismatch": [], "error": []}
    t0 = time.monotonic()
    for i, name in enumerate(names):
        try:
            df = queries[name](spark, sf_dir)
            bad = non_driver_comparable_cols(df.schema)
            if bad:
                out["mismatch"].append(name)
                print(
                    f"  NON-DRIVER-COMPARABLE {name}: {bad}", flush=True
                )
                continue
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            ok = (
                sorted(s_cols) == sorted(o_cols)
                and len(s_rows) == len(o_rows)
                and frame_key(s_cols, s_rows) == frame_key(o_cols, o_rows)
            )
            if ok:
                out["match"] += 1
            else:
                out["mismatch"].append(name)
                print(f"  MISMATCH {name}", flush=True)
        except Exception as exc:  # noqa: BLE001 — summarized, not hidden
            out["error"].append(name)
            print(f"  ERROR {name}: {exc!r}", flush=True)
        if (i + 1) % 50 == 0:
            print(
                f"  ... {i + 1}/{len(names)} "
                f"({time.monotonic() - t0:.0f}s)",
                flush=True,
            )
    out["elapsed_sec"] = round(time.monotonic() - t0, 1)
    out["ok"] = not out["mismatch"] and not out["error"]
    return out


def run_controls() -> dict:
    """The bench.py environment anchors, standalone: a judge comparing
    a BENCH_r{N}.json against these bands can attribute drift to the
    box before reading any query timing."""
    import bench

    return {
        "single_thread_sec": bench._single_thread_control(),
        "quiet_bands": {
            "window_rank": [0.20, 0.30],
            "single_thread_sec": [0.12, 0.17],
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--quick",
        action="store_true",
        help="skip the full sweep (contract + smoke + controls only)",
    )
    ap.add_argument(
        "--degenerate",
        action="store_true",
        help="also replay every entry on the edge-heavy degenerate "
        "fixture (scripts/degenerate_oracle_audit.py) — the r15 "
        "standing oracle self-audit",
    )
    ap.add_argument("--only", default=None, help="comma-separated entries")
    ap.add_argument(
        "--allow-stale-sweep",
        action="store_true",
        help="report but do not fail the sweep-at-HEAD check (mid-round "
        "use; the round-close --quick run must pass it)",
    )
    ap.add_argument(
        "--round",
        type=int,
        default=None,
        help="write SWEEP_r{N}.json (+ DEGEN_r{N}.json with --degenerate) "
        "at the repo root — the committed per-round evidence VERDICT r15 "
        "item 6 asks for, so a judge diffs artifacts instead of re-running",
    )
    args = ap.parse_args()

    summary: dict = {"contract": check_contract()}
    print(f"contract: {summary['contract']}", flush=True)

    # r18 (VERDICT r17 item 7): the artifact-lane uncached-control
    # contract — spark-free static check; a control entry silently
    # removed or switched onto an artifact fails the round gate
    from artifact_consumer_audit import controls_audit

    summary["artifact_controls"] = controls_audit()
    print(f"artifact_controls: {summary['artifact_controls']}", flush=True)

    sweep_head = check_sweep_head()
    print(f"sweep_head: {sweep_head}", flush=True)
    # enforce only in --quick without a fresh --round write: the judge's
    # round-close invocation; a --round run supersedes the committed
    # artifact it is about to rewrite, and --allow-stale-sweep is the
    # documented mid-round escape
    if args.quick and not args.allow_stale_sweep and args.round is None:
        summary["sweep_head"] = sweep_head

    from database_extractor_spark.session import create_spark_client

    spark = create_spark_client()
    summary["entry_smoke"] = run_entry_smoke(spark)
    print(f"entry_smoke: {summary['entry_smoke']}", flush=True)

    if not args.quick:
        only = args.only.split(",") if args.only else None
        summary["sweep"] = run_sweep(spark, args.sf_dir, only)
        print(
            f"sweep: {summary['sweep']['match']} match, "
            f"{len(summary['sweep']['mismatch'])} mismatch, "
            f"{len(summary['sweep']['error'])} error "
            f"in {summary['sweep']['elapsed_sec']}s",
            flush=True,
        )

    if args.degenerate:
        import tempfile

        from degenerate_oracle_audit import build_fixture

        # per-run fixture dir (ADVICE r15, low): a fixed /tmp path races
        # with a concurrent verify or degenerate_oracle_audit run
        # mid-rewrite and yields spurious mismatches; env override for
        # reusing a prebuilt fixture across runs
        degen_dir = os.environ.get(
            "DEGENERATE_SF_DIR"
        ) or tempfile.mkdtemp(prefix="degenerate_sf_")
        build_fixture(degen_dir)
        summary["degenerate_dir"] = degen_dir
        only = args.only.split(",") if args.only else None
        summary["degenerate"] = run_sweep(spark, degen_dir, only)
        print(
            f"degenerate: {summary['degenerate']['match']} match, "
            f"{len(summary['degenerate']['mismatch'])} mismatch, "
            f"{len(summary['degenerate']['error'])} error",
            flush=True,
        )

    summary["controls"] = run_controls()
    ok = all(v.get("ok", True) for v in summary.values() if isinstance(v, dict))
    summary["ok"] = ok
    if args.round is not None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        head = os.popen("git -C %s rev-parse --short HEAD" % repo).read().strip()
        head_full = os.popen("git -C %s rev-parse HEAD" % repo).read().strip()
        for key, fname in (
            ("sweep", f"SWEEP_r{args.round}.json"),
            ("degenerate", f"DEGEN_r{args.round}.json"),
        ):
            if key in summary:
                src = (
                    "degenerate edge fixture"
                    if key == "degenerate"
                    else args.sf_dir
                )
                with open(os.path.join(repo, fname), "w") as f:
                    json.dump(
                        {"head": head, "head_full": head_full,
                         "sf_dir": src, **summary[key]},
                        f,
                        indent=1,
                        default=str,
                    )
                print(f"wrote {fname}", flush=True)
    print(json.dumps(summary, default=str))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
