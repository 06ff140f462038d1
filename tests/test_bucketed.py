"""Bucketed-table tests (SURVEY.md §4): the join on the bucket key must
run exchange-free — the whole point of paying the shuffle at write time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citibike_analysis_spark.sources.bucketed import read_table, write_bucketed
from citibike_analysis_spark.sources.tables import load_table
from tests.conftest import SF0001


def _cleanup(spark):
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)  # orphans from dead sessions


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    _cleanup(spark)
    write_bucketed(
        load_table(spark, SF0001, "orders"), "b_orders", ["o_custkey"], 8
    )
    write_bucketed(
        load_table(spark, SF0001, "customer"), "b_customer", ["c_custkey"], 8
    )
    yield
    _cleanup(spark)


def test_join_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    o = read_table(spark, "b_orders")
    c = read_table(spark, "b_customer")
    # at test scale the planner would (rightly) broadcast the small side
    # and skip bucketing; disable broadcast to exercise the big-big path
    # the layout exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "o_orderkey", "c_name", "o_totalprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" not in plan  # co-located: shuffle paid at write time
    assert "SortMergeJoin" in plan


def test_bucketed_join_result_matches_plain_join(spark, bucketed_tables):
    o_plain = load_table(spark, SF0001, "orders")
    c_plain = load_table(spark, SF0001, "customer")
    expected = (
        o_plain.join(c_plain, o_plain["o_custkey"] == c_plain["c_custkey"])
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .collect()[0]
    )
    o = read_table(spark, "b_orders")
    c = read_table(spark, "b_customer")
    got = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .collect()[0]
    )
    assert got["n"] == expected["n"] and got["s"] == expected["s"]


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    # aggregation on the bucket key reuses the layout too
    o = read_table(spark, "b_orders")
    agg = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
