"""Relational surface tests: joins (incl. broadcast plan shape), agg suite,
windows, set ops, top-k, unpivot — over the TPC-H-ish fixtures."""

import pytest
from pyspark.sql import functions as F

from database_extractor_spark.operators import relational as R
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def t(spark):
    from database_extractor_spark.sources import load_tables

    return load_tables(spark, SF_DIR)


def test_join_flavors(t):
    orders, customer = t["orders"], t["customer"]
    inner = R.join_tables(orders, customer, on=[orders.o_custkey == customer.c_custkey])
    assert inner.count() == orders.count()  # every order has a customer

    big = orders.filter("o_totalprice > 300000").select("o_custkey").distinct()
    semi = R.semi_join(customer, big, on=[customer.c_custkey == big.o_custkey])
    anti = R.anti_join(customer, big, on=[customer.c_custkey == big.o_custkey])
    assert semi.count() + anti.count() == customer.count()
    assert semi.columns == customer.columns  # left columns only


def test_broadcast_hint_in_plan(t):
    li, part = t["lineitem"], t["part"]
    joined = R.join_tables(li, part, on=[li.l_partkey == part.p_partkey], broadcast_right=True)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_join_matches_plain(t):
    orders, customer = t["orders"], t["customer"]
    o = orders.withColumnRenamed("o_custkey", "k")
    c = customer.withColumnRenamed("c_custkey", "k")
    plain = o.join(c, "k").count()
    salted = R.salted_join(o, c, on="k", salt_buckets=4).count()
    assert salted == plain


def test_rollup_and_cube(t):
    orders = t["orders"]
    r = R.rollup_agg(orders, ["o_orderstatus"], [F.count("*").alias("n")])
    rows = {tuple(x) for x in r.collect()}
    total = orders.count()
    assert (None, total) in rows  # grand total row
    c = R.cube_agg(orders, ["o_orderstatus", "o_orderpriority"], [F.count("*").alias("n")])
    # cube has all 4 grouping sets: (a,b),(a),(b),()
    assert c.filter("o_orderstatus is null and o_orderpriority is null").first()["n"] == total


def test_top_k_deterministic_and_plan(t):
    orders = t["orders"]
    k = R.top_k(orders, [F.desc("o_totalprice"), F.col("o_orderkey")], 5)
    plan = k._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort materialized
    ids1 = [r["o_orderkey"] for r in k.collect()]
    ids2 = [r["o_orderkey"] for r in k.collect()]
    assert ids1 == ids2 and len(ids1) == 5


def test_top_k_per_group(t):
    orders = t["orders"]
    out = R.top_k_per_group(
        orders, ["o_orderstatus"], [F.desc("o_totalprice"), F.col("o_orderkey")], 3
    )
    counts = {r["o_orderstatus"]: r["n"] for r in out.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in counts.values())


def test_drop_duplicates_ordered_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "k string, v int"
    )
    out = R.drop_duplicates_ordered(df, ["k"], [F.col("v")])
    assert {(r["k"], r["v"]) for r in out.collect()} == {("a", 1), ("b", 9)}


def test_set_ops(t):
    cust_nations = t["customer"].select(F.col("c_nationkey").alias("nk"))
    supp_nations = t["supplier"].select(F.col("s_nationkey").alias("nk"))
    u = R.union_distinct(cust_nations, supp_nations).count()
    i = R.intersect_distinct(cust_nations.distinct(), supp_nations.distinct()).count()
    e = R.except_distinct(cust_nations, supp_nations).count()
    assert u == e + i + R.except_distinct(supp_nations, cust_nations).count()


def test_unpivot_roundtrip(spark):
    from database_extractor_spark.operators.core import pivot_wide

    df = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)], "id int, k string, v double"
    )
    wide = pivot_wide(df, "id", "k", "v", values=["x", "y"])
    long = R.unpivot_long(wide, ["id"], ["x", "y"], "k", "v")
    assert {(r["id"], r["k"], r["v"]) for r in long.collect()} == {
        (1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)
    }


def test_running_and_lag(t):
    orders = t["orders"].limit(0).sparkSession.createDataFrame(
        [(1, 1, 10.0), (1, 2, 5.0), (1, 3, 7.0), (2, 1, 1.0)],
        "cust int, seq int, price double",
    )
    run = R.with_running(orders, ["cust"], [F.col("seq")], F.sum("price"), "cum")
    got = {(r["cust"], r["seq"]): r["cum"] for r in run.collect()}
    assert got[(1, 3)] == 22.0 and got[(2, 1)] == 1.0

    lag = R.with_lag_lead(orders, ["cust"], [F.col("seq")], "price", "prev")
    got = {(r["cust"], r["seq"]): r["prev"] for r in lag.collect()}
    assert got[(1, 1)] is None and got[(1, 2)] == 10.0


def test_exact_sum_is_order_independent(spark):
    vals = [(float(f"{i}.{i%10}1"),) for i in range(1, 1001)]
    df = spark.createDataFrame(vals, "v double")
    a = df.agg(R.exact_sum("v", "s")).first()["s"]
    b = df.repartition(7).agg(R.exact_sum("v", "s")).first()["s"]
    assert a == b


def test_salted_join_rejects_unsupported_how(t):
    """The replicated right side breaks right/full/semi/anti semantics —
    salted_join must refuse them instead of silently multiplying rows."""
    orders, customer = t["orders"], t["customer"]
    for how in ("right", "full", "left_anti", "left_semi"):
        with pytest.raises(ValueError):
            R.salted_join(
                orders.withColumnRenamed("o_custkey", "k"),
                customer.withColumnRenamed("c_custkey", "k"),
                on="k",
                how=how,
            )
