#!/usr/bin/env python
"""Degenerate-fixture oracle audit (VERDICT r14 item 3, standing).

The r12-r14 advisors kept finding the same latent-divergence class:
an oracle and its Spark twin agree on the well-behaved sf fixtures but
diverge (or one side errors) on DEGENERATE input — NULL-text slices,
empty arrays, zero norms, tied timestamps, empty join sides. Grepping
for raw divisions finds candidates; this script finds FACTS: it builds
a small fixture where every such edge actually occurs, then replays the
driver-equivalent compare over EVERY registry entry.

Outcome classes:
  match        — engines agree (including agreeing on 0 rows)
  mismatch     — both ran, different answers  -> a real latent divergence
  spark_err    — engine raised, oracle ran    -> one-sided contract gap
  oracle_err   — oracle raised, engine ran    -> one-sided contract gap
  both_err     — both raised (weakly agreeing; listed for review)

Usage: python scripts/degenerate_oracle_audit.py [--only a,b] [--dir D]
Prints one line per non-match entry and a JSON summary last.

The fixture stays INSIDE the sf schema contract (64-dim embeddings,
valid JSON props, TPC-H column types) — a NULL embedding row or a
42-dim vector would violate what the generator promises and produce
findings nobody needs to fix. Edges covered:
  documents : all-NULL-text source, empty/whitespace-only text, exact
              duplicate texts, single-word docs, a NULL source, one
              source with a single doc
  embeddings: zero vector (norm 0), exact-duplicate vectors, constant
              vector, near-zero values, one label for all rows
  events    : one user entirely at ONE timestamp (total tie), a
              single-event user, purchase with no prior touches,
              NULL value cells, value=0, all five event types
  tpch      : customer with no orders, order with no lineitems,
              lineitem with discount 0 and 1, same-day ship/order
              dates, one nation with no customers, constant prices
"""
from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from full_registry_sweep import TABLES, frame_key  # noqa: E402


def build_fixture(d: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)

    def w(name, table):
        pq.write_table(table, os.path.join(d, f"{name}.parquet"))

    # --- documents: 14 rows over 5 sources (one all-NULL-text, one
    # single-doc) + a NULL-source row ---
    docs = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "src0", 44),
        (2, "the quick brown fox jumps over the lazy dog", "en", "src0", 44),
        (3, "pack my box with five dozen liquor jugs", "en", "src0", 40),
        (4, "word", "en", "src1", 4),
        (5, "", "en", "src1", 0),
        (6, "   ", "en", "src1", 3),
        (7, "aaa aaa aaa aaa aaa aaa aaa aaa", "de", "src1", 31),
        (8, None, "en", "srcnull", None),
        (9, None, "de", "srcnull", None),
        (10, "ein zwei drei vier fuenf", "de", "src2", 24),
        (11, "uno dos tres cuatro cinco seis", "es", "src2", 30),
        (12, "lonely single document here", "en", "srconly", 27),
        (13, "mixed case TEXT With   extra   spaces", "en", "src2", 37),
        (14, "the quick brown fox jumps over the lazy dog", "en", None, 44),
    ]
    w("documents", pa.table({
        "doc_id": pa.array([r[0] for r in docs], pa.int64()),
        "text": pa.array([r[1] for r in docs], pa.string()),
        "lang": pa.array([r[2] for r in docs], pa.string()),
        "source": pa.array([r[3] for r in docs], pa.string()),
        "n_chars": pa.array([r[4] for r in docs], pa.int64()),
    }))

    # --- embeddings: 24 rows x 64 dims, one label ---
    def vec(f):
        return [f(i) for i in range(64)]

    embs = []
    embs.append((0, vec(lambda i: 0.0)))                 # zero vector
    embs.append((1, vec(lambda i: 1.0)))                 # constant
    embs.append((2, vec(lambda i: 1.0)))                 # exact duplicate
    embs.append((3, vec(lambda i: 1e-6)))                # near-zero norm
    embs.append((4, vec(lambda i: -1.0)))                # antipodal of 1
    for k in range(5, 24):
        embs.append((k, vec(lambda i, k=k: ((i * 37 + k * 101) % 17 - 8)
                            / 8.0)))
    w("embeddings", pa.table({
        "vec_id": pa.array([e[0] for e in embs], pa.int64()),
        "embedding": pa.array([e[1] for e in embs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(embs), pa.int32()),
    }))

    # --- events: 48 rows ---
    t0 = datetime.datetime(2024, 1, 5, 12, 0, 0)
    ev = []
    eid = 0

    def add(ts, uid, typ, val, k):
        nonlocal eid
        ev.append((eid, ts, uid, typ, val, '{"k": %d}' % k))
        eid += 1

    # user 1: 8 events ALL at the same microsecond (total tie). Values
    # are a function of event_type: take-last over EXACTLY-tied
    # timestamps with DIFFERING values is undefined in the reference
    # itself (pandas/Flux `last` is input-order-dependent), so the
    # fixture keeps the tie edge for ordering-sensitive operators while
    # leaving take-last well-defined.
    _tv = {"view": 2.0, "click": 4.0, "signup": 3.0, "purchase": 5.0,
           "error": 7.0}
    for i, typ in enumerate(["view", "click", "view", "signup", "click",
                             "purchase", "view", "error"]):
        add(t0, 1, typ, _tv[typ], i)
    # user 2: single event, NULL value
    ev.append((eid, t0 + datetime.timedelta(hours=1), 2, "view", None,
               '{"k": 0}'))
    eid += 1
    # user 3: purchase with NO prior touches
    add(t0 + datetime.timedelta(hours=2), 3, "purchase", 100.0, 3)
    # user 4: regular funnel over 3 days, value=0 everywhere; offset 3 h
    # so no (second, type) bin overlaps user 1's tie cluster (tied ts
    # with differing values is reference-undefined, see user 1)
    for dday in range(3):
        for j, typ in enumerate(["view", "click", "signup", "purchase"]):
            add(t0 + datetime.timedelta(hours=3, days=dday, minutes=j),
                4, typ, 0.0, dday)
    # user 5: bursty then silent (inter-arrival edges), duplicate event
    # values, all same type; offset 30 min so its burst never shares a
    # (second, type) bin with user 1's tie cluster
    t5 = t0 + datetime.timedelta(minutes=30)
    for j in range(10):
        add(t5 + datetime.timedelta(seconds=j), 5, "click", 7.0, j)
    add(t5 + datetime.timedelta(days=6), 5, "click", 7.0, 99)
    # user 6: strictly increasing values for monotone edges; 7 min
    # offset keeps its first view out of user 1's tied 12:00:00 bin
    for j in range(15):
        add(t0 + datetime.timedelta(minutes=7 + 13 * j), 6, "view",
            float(j * j), j)
    w("events", pa.table({
        "event_id": pa.array([e[0] for e in ev], pa.int64()),
        "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
        "user_id": pa.array([e[2] for e in ev], pa.int64()),
        "event_type": pa.array([e[3] for e in ev], pa.string()),
        "value": pa.array([e[4] for e in ev], pa.float64()),
        "props": pa.array([e[5] for e in ev], pa.string()),
    }))

    # --- TPC-H micro world ---
    w("region", pa.table({
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA", "EMPTYREGION"], pa.string()),
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "n_name": pa.array(
            ["BRAZIL", "JAPAN", "CANADA", "GHOSTLAND"], pa.string()),
        "n_regionkey": pa.array([0, 1, 0, 2], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, 5)],
                           pa.string()),
        "c_nationkey": pa.array([0, 0, 1, 2], pa.int32()),
        # constant balances: every top-k / percentile tie-breaks
        "c_acctbal": pa.array([500.0, 500.0, 500.0, -10.0], pa.float64()),
        "c_mktsegment": pa.array(
            ["BUILDING", "BUILDING", "MACHINERY", "BUILDING"], pa.string()),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["Supplier#1", "Supplier#2"], pa.string()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64()),
    }))
    w("part", pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["green part", "red part", "promo part"],
                           pa.string()),
        "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#2"], pa.string()),
        "p_type": pa.array(
            ["PROMO BRUSHED", "STANDARD POLISHED", "PROMO ANODIZED"],
            pa.string()),
        "p_size": pa.array([1, 1, 50], pa.int32()),
        "p_retailprice": pa.array([100.0, 100.0, 100.0], pa.float64()),
    }))
    od = datetime.datetime(2024, 1, 10)
    w("orders", pa.table({
        "o_orderkey": pa.array([10, 20, 30], pa.int64()),
        # customer 3 orders; customers 2,4 have NO orders
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_orderstatus": pa.array(["F", "O", "F"], pa.string()),
        "o_totalprice": pa.array([1000.0, 1000.0, 1000.0], pa.float64()),
        "o_orderdate": pa.array([od, od, od], pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "5-LOW"], pa.string()),
    }))
    sd = od  # ship date == order date (zero latency edge)
    w("lineitem", pa.table({
        # order 30 has NO lineitems
        "l_orderkey": pa.array([10, 10, 20], pa.int64()),
        "l_partkey": pa.array([1, 2, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 1.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([100.0, 100.0, 100.0], pa.float64()),
        # discount edges: 0 and 1 (revenue terms hit 0)
        "l_discount": pa.array([0.0, 1.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0, 0.0, 0.0], pa.float64()),
        "l_returnflag": pa.array(["R", "R", "N"], pa.string()),
        "l_linestatus": pa.array(["F", "F", "O"], pa.string()),
        "l_shipdate": pa.array([sd, sd, sd], pa.timestamp("us")),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    # default is a per-run tempdir (ADVICE r15): a fixed shared /tmp
    # path races with a concurrent verify_all --degenerate run
    ap.add_argument("--dir", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    if args.dir is None:
        import tempfile

        args.dir = os.environ.get(
            "DEGENERATE_SF_DIR"
        ) or tempfile.mkdtemp(prefix="degenerate_sf_")

    build_fixture(args.dir)

    import duckdb

    import __spark_entry__ as E
    from database_extractor_spark.session import create_spark_client

    spark = create_spark_client()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )

    queries, oracles = E.queries(), E.oracle_sql()
    names = list(queries)
    if args.only:
        names = [n for n in args.only.split(",") if n in queries]

    summary = {"match": 0, "mismatch": [], "spark_err": [],
               "oracle_err": [], "both_err": [], "no_oracle": []}
    for name in names:
        s_exc = o_exc = None
        s_cols = s_rows = o_cols = o_rows = None
        try:
            df = queries[name](spark, args.dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001 — classified, not hidden
            s_exc = exc
        if name not in oracles:
            summary["no_oracle"].append(name)
            continue
        try:
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            o_exc = exc
        if s_exc and o_exc:
            summary["both_err"].append(name)
            print(f"{name}: BOTH_ERR spark={s_exc!r:.120} "
                  f"oracle={o_exc!r:.120}")
        elif s_exc:
            summary["spark_err"].append(name)
            print(f"{name}: SPARK_ERR {s_exc!r:.200}")
            traceback.print_exception(s_exc, limit=2)
        elif o_exc:
            summary["oracle_err"].append(name)
            print(f"{name}: ORACLE_ERR {o_exc!r:.200}")
        else:
            ok = (
                sorted(s_cols) == sorted(o_cols)
                and len(s_rows) == len(o_rows)
                and frame_key(s_cols, s_rows) == frame_key(o_cols, o_rows)
            )
            if ok:
                summary["match"] += 1
            else:
                summary["mismatch"].append(name)
                detail = (
                    f"rows {len(s_rows)} vs {len(o_rows)}"
                    if len(s_rows) != len(o_rows)
                    else f"schema {s_cols} vs {o_cols}"
                    if sorted(s_cols) != sorted(o_cols)
                    else "values"
                )
                print(f"{name}: MISMATCH ({detail})")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
